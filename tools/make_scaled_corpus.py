"""Build the 10x dup-rate-preserving documents corpus used for the
round-6 single-file scaling isolations (OPTIMIZATION_r06.md §12/§15).

10 copies of sf0.1 documents, doc_id offset by copy*10_000_000 (keeps
the queries' +100k..+400k augmentation ids disjoint across copies);
copies > 0 get a copy-specific token inserted every 4 words so no
45-char window, 5-token shingle or 3-gram block crosses copies — the
duplicate RATE of the corpus is preserved instead of planting an
artificial 10-way dup family per doc. Written as ONE parquet file with
ONE row group: the driver-table layout, whose scans are exactly one
task (row groups are the split granularity) — the input-skew shape
_spread_if_large exists for.

Usage: python tools/make_scaled_corpus.py [out_dir] [copies]
Other tables are symlinked from sf0.1 (only documents is scaled).
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbig"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    df = pd.read_parquet(f"{SRC}/documents.parquet")
    parts = []
    for c in range(copies):
        d = df.copy()
        d["doc_id"] = d["doc_id"] + c * 10_000_000
        if c > 0:
            tok = f"cp{c}q"

            def perturb(t: str, tok: str = tok) -> str:
                out = []
                for i, w in enumerate(t.split(" ")):
                    out.append(w)
                    if i % 4 == 3:
                        out.append(tok)
                return " ".join(out)

            d["text"] = d["text"].map(perturb)
            d["n_chars"] = d["text"].str.len()
        parts.append(d)
    big = pd.concat(parts, ignore_index=True)
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(big, preserve_index=False),
        f"{out_dir}/documents.parquet",
        row_group_size=len(big),
    )
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    print(f"{out_dir}: {len(big)} docs, "
          f"{os.path.getsize(f'{out_dir}/documents.parquet')} bytes, "
          f"1 file / 1 row group")


if __name__ == "__main__":
    main()
