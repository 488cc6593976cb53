"""Checkpoint/vocab path resolution with a local download cache.

Capability parity with /root/reference/pytorch_pretrained_bert/file_utils.py
(:26-239): resolve a local path, ``http(s)://`` URL or ``s3://`` URI to a
local file, caching downloads under ``~/.cache/vlp_tpu`` keyed by
url + etag.  Network deps (requests/boto3) are imported lazily — on
air-gapped TPU pods only local paths are used and nothing is imported.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
from typing import Optional
from urllib.parse import urlparse

CACHE_DIR = os.path.expanduser(
    os.environ.get("VLP_TPU_CACHE", "~/.cache/vlp_tpu"))


def url_to_filename(url: str, etag: Optional[str] = None) -> str:
    h = hashlib.sha256(url.encode()).hexdigest()
    if etag:
        h += "." + hashlib.sha256(etag.encode()).hexdigest()
    return h


def cached_path(url_or_filename: str,
                cache_dir: Optional[str] = None) -> str:
    """Return a local path for a file that may live at a URL/S3 URI."""
    parsed = urlparse(url_or_filename)
    if parsed.scheme in ("http", "https"):
        return _http_cached(url_or_filename, cache_dir or CACHE_DIR)
    if parsed.scheme == "s3":
        return _s3_cached(url_or_filename, cache_dir or CACHE_DIR)
    if os.path.exists(url_or_filename):
        return url_or_filename
    raise FileNotFoundError(f"file not found: {url_or_filename}")


def _http_cached(url: str, cache_dir: str) -> str:
    import requests  # lazy: network path only

    os.makedirs(cache_dir, exist_ok=True)
    etag = None
    try:
        r = requests.head(url, allow_redirects=True, timeout=10)
        if r.status_code == 200:
            etag = r.headers.get("ETag")
    except requests.RequestException:
        pass
    fname = url_to_filename(url, etag)
    cache_path = os.path.join(cache_dir, fname)
    if os.path.exists(cache_path):
        return cache_path
    with tempfile.NamedTemporaryFile(dir=cache_dir, delete=False) as tmp:
        with requests.get(url, stream=True, timeout=60) as r:
            r.raise_for_status()
            for chunk in r.iter_content(chunk_size=1 << 20):
                tmp.write(chunk)
        tmp_path = tmp.name
    shutil.move(tmp_path, cache_path)
    with open(cache_path + ".json", "w") as f:
        json.dump({"url": url, "etag": etag}, f)
    return cache_path


def _split_s3(url: str):
    parsed = urlparse(url)
    return parsed.netloc, parsed.path.lstrip("/")


def _s3_cached(url: str, cache_dir: str) -> str:
    import boto3  # lazy: network path only

    os.makedirs(cache_dir, exist_ok=True)
    bucket, key = _split_s3(url)
    s3 = boto3.resource("s3")
    obj = s3.Object(bucket, key)
    etag = obj.e_tag
    fname = url_to_filename(url, etag)
    cache_path = os.path.join(cache_dir, fname)
    if os.path.exists(cache_path):
        return cache_path
    with tempfile.NamedTemporaryFile(dir=cache_dir, delete=False) as tmp:
        s3.Bucket(bucket).download_fileobj(key, tmp)
        tmp_path = tmp.name
    shutil.move(tmp_path, cache_path)
    return cache_path
