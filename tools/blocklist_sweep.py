"""Automaton-vs-expression sweep for blocklist_matches: the expr mode
pays one counting scan PER PHRASE (cost ~ |corpus| x |phrases|), the
Aho-Corasick mode one automaton pass (cost ~ |corpus|, independent of
|phrases|). Sweeps synthetic blocklists of 8/64/512 phrases at sf0.1
and reports wall seconds; results are asserted identical per size.

Usage: python tools/blocklist_sweep.py [sf_dir]
Prints a markdown table for PERF.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from automated_review_analysis_pipeline_spark.operators import (  # noqa: E402
    curation as cur,
)
from automated_review_analysis_pipeline_spark.session import get_spark  # noqa: E402
from automated_review_analysis_pipeline_spark.sources.tables import (  # noqa: E402
    load_table,
)

# deterministic synthetic blocklist: letter trigrams/quadgrams that DO
# occur in the word-salad corpus, plus shared-prefix shapes
def phrases(n: int) -> tuple:
    import itertools
    import string

    base = []
    for a, b in itertools.product(string.ascii_lowercase, repeat=2):
        base.append(a + b)
        base.append(a + b + "e")
        if len(base) >= n:
            break
    return tuple(base[:n])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text").localCheckpoint(eager=True)

    print("| phrases | automaton s | expr s |")
    print("|---|---|---|")
    for n in (8, 64, 512):
        ph = phrases(n)
        t0 = time.time()
        a = sorted(map(tuple, cur.blocklist_matches(
            docs, ph, mode="automaton").collect()))
        ta = time.time() - t0
        t0 = time.time()
        e = sorted(map(tuple, cur.blocklist_matches(
            docs, ph, mode="expr").collect()))
        te = time.time() - t0
        assert a == e, f"modes disagree at n={n}"
        print(f"| {n} | {ta:.2f} | {te:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
