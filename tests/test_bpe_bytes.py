"""Byte-level (GPT-2 form) BPE lane: pretokenizer, byte alphabet,
hand-computed training/encoding goldens, strategy equality, true-rescan
encoder semantics, and HF-interchange export/import.

SURVEY.md §2B extension scope; the published GPT-2 encoder.py
(bytes_to_unicode + pretokenizer regex) is the public spec. The
cross-engine value gate is the bpe_*_bytes registry oracles; these
pytests pin the hand-verifiable semantics.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automated_review_analysis_pipeline_spark.operators.textanalysis import (
    _B2U,
    _bpe_kernel_udf,
    _train_merges,
    bpe_encode,
    bpe_vocab,
    byte_symbols,
    gpt2_bytes_to_unicode,
    pretokenize_gpt2,
)

SF = "/root/testdata/sf0.001"


def _pretok(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i int, t string")
    rows = df.select("i", pretokenize_gpt2(F.col("t")).alias("p")).collect()
    return [r["p"] for r in sorted(rows, key=lambda r: r["i"])]


def test_bytes_to_unicode_is_the_standard_table():
    m = gpt2_bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256
    # printable latin-1 bytes map to themselves
    assert m[ord("!")] == "!" and m[ord("~")] == "~" and m[0xA1] == "\xa1"
    # the canonical shifted examples: space, newline, DEL
    assert m[0x20] == "Ġ"  # 'Ġ'
    assert m[0x0A] == "Ċ"  # 'Ċ'
    assert m[0x00] == "Ā"  # 'Ā'


def test_pretokenizer_gpt2_splits(spark):
    texts = [
        "Hello world",
        "it's we'll they've I'm you'd",
        "Hello,  world!!",
        "a   b",
        "tabs\t\tx",
        "trailing   ",
        "x 's y",
    ]
    got = _pretok(spark, texts)
    assert got[0] == ["Hello", " world"]
    assert got[1] == ["it", "'s", " we", "'ll", " they", "'ve",
                      " I", "'m", " you", "'d"]
    assert got[2] == ["Hello", ",", " ", " world", "!!"]
    # whitespace run splits before its last space; that space attaches
    assert got[3] == ["a", "  ", " b"]
    # non-space whitespace never attaches to the following word
    assert got[4] == ["tabs", "\t", "\t", "x"]
    assert got[5] == ["trailing", "   "]
    # the space attaches to the punctuation class, not the contraction
    assert got[6] == ["x", " '", "s", " y"]
    # losslessness: pretokens concatenate back to the original text
    for text, toks in zip(texts, got):
        assert "".join(toks) == text


def test_byte_symbols_multibyte_utf8(spark):
    df = spark.createDataFrame([("café 中",)], "t string")
    syms = df.select(byte_symbols(F.col("t")).alias("s")).collect()[0]["s"]
    want = [_B2U[b] for b in "café 中".encode("utf-8")]
    assert syms == want
    assert syms[:3] == ["c", "a", "f"]
    assert syms[3:5] == ["\xc3", "\xa9"]          # é = C3 A9
    assert syms[5] == "Ġ"                    # space -> Ġ
    assert len(syms) == 3 + 2 + 1 + 3             # 中 = 3 bytes


def test_byte_bpe_hand_computed_golden(spark):
    """Fully hand-computed: corpus 'ab ab, café café!', 3 merges.
    Pretokens: ab | ' ab' | ',' | ' café' x2 | '!'. Pair counts weight
    by pretoken frequency; ties break (count desc, left asc, right
    asc). Hand-derivation: merge1 (a,b) n=2; merge2 (a,f) n=2;
    merge3 (af,Ã) n=2."""
    docs = spark.createDataFrame([(1, "ab ab, café café!")],
                                 "doc_id long, text string")
    learned = _train_merges(docs, 3, "text", mode="byte")
    assert learned == [
        (1, "a", "b", "ab", 2),
        (2, "a", "f", "af", 2),
        (3, "af", "\xc3", "af\xc3", 2),
    ]
    enc = bpe_encode(docs, merges=learned, mode="byte").collect()
    assert len(enc) == 1
    r = enc[0]
    assert r["n_bpe_tokens"] == 13
    assert r["bpe_tokens"] == (
        "ab Ġ ab , Ġ c af\xc3 \xa9 Ġ c af\xc3 \xa9 !")
    # round-trip: mapped symbols decode back to the exact original text
    # (pretokens carry their attached spaces, so nothing is lost)
    u2b = {u: b for b, u in gpt2_bytes_to_unicode().items()}
    joined = "".join(r["bpe_tokens"].split(" "))
    decoded = bytes(u2b[ch] for ch in joined).decode("utf-8")
    assert decoded == "ab ab, café café!"


def test_byte_vocab_closed_alphabet(spark):
    docs = spark.createDataFrame([(1, "ab ab, café café!")],
                                 "doc_id long, text string")
    learned = _train_merges(docs, 3, "text", mode="byte")
    v = bpe_vocab(docs, merges=learned, mode="byte").collect()
    assert len(v) == 256 + 3
    base = [r["token"] for r in v if r["kind"] == "base"]
    assert len(base) == 256 and base == sorted(base)
    assert set(base) == set(_B2U.values())
    merges = [(r["vocab_id"], r["token"]) for r in v if r["kind"] == "merge"]
    assert merges == [(257, "ab"), (258, "af"), (259, "af\xc3")]


def test_byte_kernel_equals_literal(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(120)
    learned = _train_merges(docs, 12, "text", batch=4, mode="byte")
    lit = bpe_encode(docs, merges=learned, mode="byte",
                     strategy="literal").collect()
    ker = bpe_encode(docs, merges=learned, mode="byte",
                     strategy="kernel").collect()
    assert [tuple(r) for r in lit] == [tuple(r) for r in ker]
    assert len(lit) > 0


def test_rescan_kernel_matches_reference_bpe(spark):
    """rescan=True is TRUE GPT-2/HF semantics: after every merge,
    re-scan from the lowest rank. Crafted divergence case: ranks
    1:(wx,y) 2:(w,x) 3:(y,z) on 'wxyz' -- rescan gives [wxy, z]
    (rank 2 creates 'wx', re-scan fires rank 1 before rank 3); the
    rank-monotone fold gives [wx, yz]."""
    pairs = [("wx", "y"), ("w", "x"), ("y", "z")]
    df = spark.createDataFrame([("wxyz",), ("wxy",), ("zz",)], "w string")
    enc_re = _bpe_kernel_udf(spark, pairs, mode="byte", rescan=True)
    enc_fold = _bpe_kernel_udf(spark, pairs, mode="byte", rescan=False)
    out = {r["w"]: (r["a"], r["b"]) for r in df.select(
        "w", enc_re("w").alias("a"), enc_fold("w").alias("b")).collect()}
    assert out["wxyz"][0] == ["wxy", "z"]
    assert out["wxyz"][1] == ["wx", "yz"]
    # rescan re-fires rank 1 after rank 2 creates 'wx'; the fold is
    # rank-monotone and cannot go back
    assert out["wxy"][0] == ["wxy"] and out["wxy"][1] == ["wx", "y"]
    assert out["zz"] == (["z", "z"], ["z", "z"])

    # reference implementation of the published bpe() loop, in-test
    def ref_bpe(word: str, ranks: dict) -> list[str]:
        syms = list(word)
        while len(syms) >= 2:
            cands = [(ranks.get(p, 1 << 30), p)
                     for p in zip(syms, syms[1:])]
            best, pair = min(cands)
            if best >= 1 << 30:
                break
            left, right = pair
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    ranks = {p: i for i, p in enumerate(pairs)}
    for w, (re_out, _) in out.items():
        assert re_out == ref_bpe(w, ranks), w


def test_byte_export_import_roundtrip(spark, tmp_path):
    from automated_review_analysis_pipeline_spark.sinks.tokenizer import (
        export_tokenizer,
        import_tokenizer,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(150)
    learned = _train_merges(docs, 8, "text", mode="byte")
    vocab = bpe_vocab(docs, merges=learned, mode="byte")
    d1, d2 = tmp_path / "a", tmp_path / "b"
    p1 = export_tokenizer(learned, vocab, str(d1))
    p2 = export_tokenizer(learned, vocab, str(d2))
    # byte-stability: same inputs -> identical bytes
    for k in ("merges", "vocab"):
        assert open(p1[k], "rb").read() == open(p2[k], "rb").read()
    # merge symbols are whitespace-free by construction (byte mapping)
    for line in open(p1["merges"], encoding="utf-8").read().splitlines()[1:]:
        assert " " in line and not any(
            ch.isspace() for ch in line.replace(" ", ""))
    imported, vocab_dict = import_tokenizer(str(d1))
    assert [(m[0], m[1], m[2], m[3]) for m in imported] == \
        [(m[0], m[1], m[2], m[3]) for m in learned]
    assert len(vocab_dict) == 256 + 8
    # imported merges drive encode to the identical result
    a = bpe_encode(docs, merges=learned, mode="byte").collect()
    b = bpe_encode(docs, merges=imported, mode="byte").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_byte_token_count_covers_all_bytes(spark):
    """The loader-contract fix: byte-level n_bpe_tokens accounts for
    EVERY byte of the text (sum of symbol lengths in bytes == utf-8
    length), unlike the word-level lane which drops punctuation."""
    texts = ["Hello,  world!! it's café ~ 42."]
    docs = spark.createDataFrame([(1, texts[0])], "doc_id long, text string")
    r = bpe_encode(docs, merges=[], mode="byte").collect()[0]
    u2b = {u: b for b, u in _B2U.items()}
    total_bytes = sum(1 for t in r["bpe_tokens"].split(" ") for _ in t)
    assert r["n_bpe_tokens"] == len(texts[0].encode("utf-8"))
    assert total_bytes == r["n_bpe_tokens"]
    # and every symbol decodes to a real byte
    assert all(ch in u2b for t in r["bpe_tokens"].split(" ") for ch in t)
