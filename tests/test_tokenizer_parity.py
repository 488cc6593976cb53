"""Tokenizer parity against the actual reference implementation.

Loads /root/reference/pytorch_pretrained_bert/tokenization.py directly (module
file, bypassing the package __init__ whose torch._six import is dead on
modern torch) and compares behavior on a corpus of tricky strings.  Skipped
when the reference tree is not mounted.
"""

import importlib.util
import os
import sys
import types

import pytest

REF = "/root/reference/pytorch_pretrained_bert/tokenization.py"

pytestmark = pytest.mark.skipif(not os.path.isfile(REF),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_tok():
    # stub the network deps file_utils pulls in
    for name in ("boto3", "requests"):
        sys.modules.setdefault(name, types.ModuleType(name))
    exc = types.ModuleType("botocore.exceptions")
    exc.ClientError = Exception
    sys.modules.setdefault("botocore", types.ModuleType("botocore"))
    sys.modules.setdefault("botocore.exceptions", exc)
    # file_utils is imported relatively; load it under the expected package
    pkg = types.ModuleType("ref_ppb")
    pkg.__path__ = [os.path.dirname(REF)]
    sys.modules["ref_ppb"] = pkg
    for mod in ("file_utils", "tokenization"):
        spec = importlib.util.spec_from_file_location(
            f"ref_ppb.{mod}", os.path.join(os.path.dirname(REF),
                                           f"{mod}.py"))
        m = importlib.util.module_from_spec(spec)
        sys.modules[f"ref_ppb.{mod}"] = m
        spec.loader.exec_module(m)
    return sys.modules["ref_ppb.tokenization"]


CORPUS = [
    "A man riding a horse.",
    "Héllo, don't run fast!",
    "ab中cd文ef",
    "  multiple   spaces\tand\ttabs ",
    "UPPER lower MiXeD",
    "hyphen-ated co-op e-mail",
    "numbers 1,000.5 and 42%",
    "…ellipsis—dashes“quotes”",
    "[CLS] special [SEP] tokens [MASK]",
    "naïve café résumé",
    "a" * 120,  # over the 100-char wordpiece cap
    "!!!???...",
]


def test_basic_tokenizer_parity(ref_tok):
    from vlp_tpu.data.tokenization import BasicTokenizer
    for lower in (True, False):
        ref = ref_tok.BasicTokenizer(do_lower_case=lower)
        ours = BasicTokenizer(do_lower_case=lower)
        for text in CORPUS:
            assert ours.tokenize(text) == ref.tokenize(text), (lower, text)


def test_wordpiece_parity(ref_tok, tmp_path):
    from vlp_tpu.data.tokenization import WordpieceTokenizer
    vocab = {w: i for i, w in enumerate(
        ["[UNK]", "a", "man", "rid", "##ing", "##e", "horse", "un", "##aff",
         "##able", "ca", "##fe", "!", ".", ","])}
    ref = ref_tok.WordpieceTokenizer(vocab=vocab)
    ours = WordpieceTokenizer(vocab=vocab)
    for text in ["riding", "unaffable", "cafe", "horse", "zzz", "a", "man",
                 "a" * 120]:
        assert ours.tokenize(text) == ref.tokenize(text), text


def test_vocab_load_remap_parity(ref_tok, tmp_path):
    from vlp_tpu.data.tokenization import load_vocab
    words = ["[PAD]"] + [f"[unused{i}]" for i in range(1, 15)] + ["[UNK]",
                                                                  "hello"]
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(words) + "\n")
    ours = load_vocab(str(p))
    ref = ref_tok.load_vocab(str(p))
    assert dict(ours) == dict(ref)


def test_fuzz_random_strings(ref_tok):
    """500 random unicode-ish strings through both basic tokenizers."""
    import random
    from vlp_tpu.data.tokenization import BasicTokenizer
    rnd = random.Random(42)
    pools = [
        (0x20, 0x7E),       # ascii
        (0xA0, 0x2FF),      # latin supplement/extended
        (0x370, 0x3FF),     # greek
        (0x4E00, 0x4E80),   # CJK
        (0x2000, 0x206F),   # punctuation block
    ]
    ref = ref_tok.BasicTokenizer(do_lower_case=True)
    ours = BasicTokenizer(do_lower_case=True)
    for _ in range(500):
        n = rnd.randint(0, 40)
        s = "".join(chr(rnd.randint(*pools[rnd.randrange(len(pools))]))
                    for _ in range(n))
        assert ours.tokenize(s) == ref.tokenize(s), repr(s)
