"""Generate fixtures/zlib_signals.parquet (round-10 verdict #6).

zlib has no DuckDB codec, so `text_compression_ratio` was the last
rows-only registry entry. deflate output for a fixed (input, level) is
deterministic, so the expected compressed LENGTHS can be precomputed once
into a fixture keyed by md5(text) — a key both engines compute natively —
and the DuckDB oracle joins documents against it, recomputing n_bytes and
the ratio in SQL. The fixture is ground truth from direct stdlib calls
(independent of the Spark operator's mapInPandas plumbing, which is what
the hash gate then actually exercises); an unknown text simply drops from
the join and flags as a row-count mismatch rather than passing silently.

Covers every sf dir under /root/testdata so the oracle works at any gate
scale. Rerun after testdata changes: python tools/make_zlib_fixture.py
"""

from __future__ import annotations

import glob
import hashlib
import os
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

LEVEL = 6  # operators/text.compression_signals default


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: dict[str, tuple[int, int]] = {}
    for path in sorted(glob.glob("/root/testdata/sf*/documents.parquet")):
        tbl = pq.read_table(path, columns=["text"])
        for t in tbl.column("text").to_pylist():
            if t is None:
                continue
            raw = t.encode("utf-8")
            key = hashlib.md5(raw).hexdigest()
            if key not in seen:
                seen[key] = (len(raw), len(zlib.compress(raw, LEVEL)))
    out = os.path.join(root, "fixtures", "zlib_signals.parquet")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    keys = sorted(seen)
    pq.write_table(
        pa.table(
            {
                "text_md5": pa.array(keys, pa.string()),
                "n_bytes_fx": pa.array(
                    [seen[k][0] for k in keys], pa.int64()
                ),
                "n_compressed_fx": pa.array(
                    [seen[k][1] for k in keys], pa.int64()
                ),
            }
        ),
        out,
    )
    print(f"{out}: {len(keys)} distinct texts")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
