"""Generate a scaled copy of a testdata tier for scale-contract runs.

``python scripts/gen_scale.py SRC_DIR OUT_DIR FACTOR`` replicates the
fact tables FACTOR× with deterministic key offsets so that per-key
structure is preserved and CROSS-COPY structure is not invented:

- ``documents``: doc_id offset; every whitespace token gets a per-copy
  suffix (``_c<i>``), so shingle/fingerprint sets are DISJOINT across
  copies — each copy keeps exactly the original's near-duplicate
  clusters and candidate-pair density. Without this, FACTOR copies of
  identical text would weld every dup cluster FACTOR× bigger and the
  pair count would grow quadratically — measuring the data, not the
  engine. Row counts scale linearly by construction; time-vs-rows is
  then a clean read on the operator.
- ``customer``/``orders``: custkey and orderkey offset by the same
  stride, so the orders↔customer join stays within-copy (more
  customers, same segments — groups get FACTOR× rows).
- ``lineitem``: l_orderkey offset, part/supplier catalog UNCHANGED —
  the realistic 100-TB shape (baskets grow, the catalog doesn't).
- ``events``: event_id/user_id offset (more users, same time range).
- dimension tables and ``embeddings`` are copied verbatim.

Copy 0 is the identity, so the scaled tier strictly contains the
source tier. Everything is deterministic — no RNG, no timestamps.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pandas as pd

STRIDE = 10_000_000

COPY_VERBATIM = ["region", "nation", "part", "supplier", "embeddings"]


def _suffix_tokens(text: str, i: int) -> str:
    return " ".join(f"{tok}_c{i}" for tok in text.split(" "))


def scale_table(src: Path, out: Path, name: str, factor: int) -> int:
    df = pd.read_parquet(src / f"{name}.parquet")
    copies = []
    for i in range(factor):
        c = df.copy()
        if name == "documents":
            c["doc_id"] = c["doc_id"] + i * STRIDE
            if i > 0:
                c["text"] = c["text"].map(lambda t, i=i: _suffix_tokens(t, i))
                c["n_chars"] = c["text"].str.len().astype("int64")
        elif name == "customer":
            c["c_custkey"] = c["c_custkey"] + i * STRIDE
        elif name == "orders":
            c["o_orderkey"] = c["o_orderkey"] + i * STRIDE
            c["o_custkey"] = c["o_custkey"] + i * STRIDE
        elif name == "lineitem":
            c["l_orderkey"] = c["l_orderkey"] + i * STRIDE
        elif name == "events":
            c["event_id"] = c["event_id"] + i * STRIDE
            c["user_id"] = c["user_id"] + i * STRIDE
        copies.append(c)
    big = pd.concat(copies, ignore_index=True)
    big.to_parquet(out / f"{name}.parquet", index=False)
    return len(big)


def main() -> None:
    src, out, factor = Path(sys.argv[1]), Path(sys.argv[2]), int(sys.argv[3])
    out.mkdir(parents=True, exist_ok=True)
    for name in COPY_VERBATIM:
        shutil.copyfile(src / f"{name}.parquet", out / f"{name}.parquet")
    for name in ["documents", "customer", "orders", "lineitem", "events"]:
        n = scale_table(src, out, name, factor)
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
