"""Tokenizer interchange artifacts: merges.txt + vocab.json.

The in-engine BPE family (operators/textanalysis.py: bpe_train ->
bpe_vocab -> bpe_encode) produces the merge and vocabulary tables as
DataFrames; a training stack consumes them as files in the standard
GPT-2/HF interchange form -- ``merges.txt`` ("#version: 0.2" header,
one "left right" pair per line in rank order) and ``vocab.json`` (a
token -> id object). This module is that last mile, plus the inverse
(import) so a table exported here -- or produced by any tokenizer
trainer using the same format -- can drive :func:`bpe_encode` directly.

Driver-side small-artifact IO, the same convention as the memo cache's
JSON migration (operators/cache.py:import_json_cache): the artifacts
are KB-to-MB sized regardless of corpus scale (they are vocabulary-,
not corpus-, sized), so files on the driver are the right tool -- no
Spark job is involved. Pass ``spark`` to route the bytes through the
Hadoop FileSystem API instead of POSIX open (fsio -- the round-12
store-sidecar discipline), so ``out_dir``/``in_dir`` may live on
s3a://, hdfs://, ... exactly like the persisted-index sidecars; the
bytes written are identical either way.

Export is byte-stable: same inputs -> identical bytes (sorted-by-id
vocab, '\n' line endings, compact JSON separators), pinned by pytest.
"""
from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

MERGES_FILE = "merges.txt"
VOCAB_FILE = "vocab.json"
MERGES_HEADER = "#version: 0.2"


def _resolve_dir(path: str) -> str:
    """Pin a SCHEME-LESS dir to the driver's local filesystem
    (``file:``). The Hadoop route resolves bare paths against
    ``fs.defaultFS`` -- so on a cluster whose defaultFS is hdfs://, an
    export that used to land on the driver's local disk (the POSIX
    behavior, and what a bare path means everywhere else in a Python
    program) would silently land on HDFS, and worse, WHICH filesystem
    it landed on would depend on whether ``spark`` happened to be
    inferred from a DataFrame vocab. Bare paths therefore always mean
    driver-local here; to target defaultFS or a remote store, pass a
    full URI (s3a://..., hdfs://...)."""
    if ":/" in path:  # already scheme-qualified (file:, s3a://, ...)
        return path
    return "file:" + os.path.abspath(path)


def export_tokenizer(merges: list[tuple], vocab: DataFrame | list[tuple],
                     out_dir: str, spark=None) -> dict[str, str]:
    """Write ``merges.txt`` + ``vocab.json`` under ``out_dir``.

    ``merges``: the learned (rank, left, right, merged, n_occurrences)
    tuples (bpe_train's rows / _train_merges' return). ``vocab``: the
    :func:`~..operators.textanalysis.bpe_vocab` DataFrame -- or its
    (vocab_id, token, kind) rows -- written as {token: id} in id order.
    Returns {"merges": path, "vocab": path}. With ``spark`` (taken
    from a DataFrame vocab automatically), bytes route through the
    Hadoop FS API so ``out_dir`` may be s3a://...; byte-identical to
    the POSIX path either way (pytest-pinned). A SCHEME-LESS
    ``out_dir`` always means the driver's local disk on both routes
    (see :func:`_resolve_dir`) -- it is never resolved against
    fs.defaultFS.

    Symbols never contain whitespace (the pre-tokenizer emits \\w+ runs
    or single non-space symbols), which is what makes the
    space-separated merges.txt line format unambiguous; guarded anyway
    so a foreign merge table cannot silently corrupt the artifact.
    """
    if isinstance(vocab, DataFrame) and spark is None:
        spark = vocab.sparkSession
    if spark is None:
        os.makedirs(out_dir, exist_ok=True)
        io_dir = out_dir
    else:
        # resolve for the Hadoop route only; returned paths keep the
        # caller's original form (a bare dir stays a bare dir)
        io_dir = _resolve_dir(out_dir)
    rows = (vocab.select("vocab_id", "token").collect()
            if isinstance(vocab, DataFrame) else
            [(r[0], r[1]) for r in vocab])

    lines = [MERGES_HEADER]
    for _, left, right, _, _ in sorted(merges, key=lambda m: m[0]):
        if any(ch.isspace() for ch in left + right):
            raise ValueError(
                f"merge pair ({left!r}, {right!r}) contains whitespace; "
                "not representable in merges.txt")
        lines.append(f"{left} {right}")
    merges_text = "\n".join(lines) + "\n"
    merges_path = os.path.join(out_dir, MERGES_FILE) if spark is None \
        else out_dir.rstrip("/") + "/" + MERGES_FILE
    if spark is not None:
        from .. import fsio

        fsio.write_text(spark, fsio.join(io_dir, MERGES_FILE),
                        merges_text)
    else:
        with open(merges_path, "w", encoding="utf-8", newline="\n") as f:
            f.write(merges_text)

    vocab_obj = {token: int(vid)
                 for vid, token in sorted(rows, key=lambda r: int(r[0]))}
    vocab_text = json.dumps(vocab_obj, ensure_ascii=False,
                            separators=(",", ":")) + "\n"
    vocab_path = os.path.join(out_dir, VOCAB_FILE) if spark is None \
        else out_dir.rstrip("/") + "/" + VOCAB_FILE
    if spark is not None:
        from .. import fsio

        fsio.write_text(spark, fsio.join(io_dir, VOCAB_FILE), vocab_text)
    else:
        with open(vocab_path, "w", encoding="utf-8", newline="\n") as f:
            f.write(vocab_text)
    return {"merges": merges_path, "vocab": vocab_path}


def import_tokenizer(in_dir: str,
                     spark=None) -> tuple[list[tuple], dict[str, int]]:
    """Read ``merges.txt`` + ``vocab.json`` back into the engine's
    shapes: a merge list consumable by ``bpe_encode(merges=...)`` (ranks
    re-derived from line order; n_occurrences is not part of the
    interchange format and comes back 0) and the {token: id} vocab dict.
    ``vocab.json`` is optional -- encode only needs the merges."""
    if spark is not None:
        from .. import fsio

        in_dir = _resolve_dir(in_dir)
        merges_text = fsio.read_text(spark, fsio.join(in_dir, MERGES_FILE))
    else:
        with open(os.path.join(in_dir, MERGES_FILE),
                  encoding="utf-8") as f:
            merges_text = f.read()
    merges: list[tuple] = []
    for line in merges_text.split("\n"):
        if not line or line.startswith("#"):
            continue
        left, sep, right = line.partition(" ")
        if not sep or not left or not right:
            raise ValueError(f"malformed merges.txt line: {line!r}")
        merges.append((len(merges) + 1, left, right, left + right, 0))

    vocab: dict[str, int] = {}
    if spark is not None:
        from .. import fsio

        vp = fsio.join(in_dir, VOCAB_FILE)
        if fsio.exists(spark, vp):
            vocab = {str(k): int(v)
                     for k, v in fsio.read_json(spark, vp).items()}
    else:
        vocab_path = os.path.join(in_dir, VOCAB_FILE)
        if os.path.exists(vocab_path):
            with open(vocab_path, encoding="utf-8") as f:
                vocab = {str(k): int(v) for k, v in json.load(f).items()}
    return merges, vocab
