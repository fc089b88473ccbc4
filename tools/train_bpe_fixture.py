"""Generate the vendored BPE merge table at
goflow2clickhouse_spark/data/bpe_merges.txt.

The production BPE tier (operators/text.with_bpe_token_count) needs a
merge table of realistic size. GPT-2's published merges.txt would be
the natural fixture, but this environment has no network access, so
the table is TRAINED here — with the classic algorithm the published
tables were trained with (train_bpe_merges: Sennrich, Haddow & Birch
2016) — over the largest deterministic public text corpus available
offline: the PySpark source text shipped inside the installed pyspark
package (Apache-2.0; ~8.9M chars, ~18.5k distinct pre-tokens of mixed
code and English prose). A published merges.txt drops in unchanged —
same line format, same loader (load_bpe_merges).

Run from the repo root:  python tools/train_bpe_fixture.py
Deterministic: same pyspark version -> byte-identical table.
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_MERGES = 2000

from goflow2clickhouse_spark.operators.text import (  # noqa: E402
    BPE_PRETOKEN_RE,
    _check_bpe_merges,
    train_bpe_merges,
)


def corpus_word_counts() -> dict[str, int]:
    import pyspark

    root = os.path.dirname(pyspark.__file__)
    rx = re.compile(BPE_PRETOKEN_RE)
    counts: dict[str, int] = {}
    n_chars = 0
    for dirpath, dirnames, filenames in os.walk(root):
        # data/jars/licenses hold no prose; examples vary by distro
        dirnames[:] = sorted(
            d for d in dirnames
            if d not in ("jars", "bin", "data", "licenses", "examples")
        )
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            with open(
                os.path.join(dirpath, fn), encoding="utf-8",
                errors="ignore",
            ) as f:
                txt = f.read()
            n_chars += len(txt)
            for w in rx.findall(txt):
                counts[w] = counts.get(w, 0) + 1
    print(f"corpus: {n_chars} chars, {len(counts)} distinct pre-tokens")
    return counts


def main() -> None:
    import pyspark

    counts = corpus_word_counts()
    merges = train_bpe_merges(counts, N_MERGES)
    _check_bpe_merges(tuple(merges))
    out = os.path.join(
        os.path.dirname(__file__), "..", "goflow2clickhouse_spark",
        "data", "bpe_merges.txt",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        f.write(
            "#trained in-repo by tools/train_bpe_fixture.py: classic "
            "BPE (train_bpe_merges) over the PySpark "
            f"{pyspark.__version__} package source text "
            f"({len(counts)} distinct pre-tokens), "
            f"n_merges={N_MERGES}, min_count=2. A published "
            "merges.txt (e.g. GPT-2's) drops in unchanged.\n"
        )
        for a, b in merges:
            f.write(f"{a} {b}\n")
    print(f"wrote {len(merges)} merges to {os.path.abspath(out)}")


if __name__ == "__main__":
    main()
