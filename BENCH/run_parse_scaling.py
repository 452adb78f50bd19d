#!/usr/bin/env python
"""Isolated parse-stage scaling probe (N vs 4N parallelism).

The end-to-end pipeline includes shuffles, commits, and driver-side actions
whose fixed cost pollutes small-corpus wall-clock ratios. This probe times
ONLY the CPU-bound parse pass (the hot loop of the whole engine: detokenize
-> timestamp strip -> tokenize -> encode) at two parallelism levels on the
same warm corpus, best-of-R interleaved, and prints a JSON line with the
efficiency. One parse task = 1 JVM thread + 1 Python/Arrow worker, so at
local[16] the 32-CPU sandbox is exactly saturated (the 4N analog of a real
cluster where executor cores are provisioned for both sides).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIZES = tuple(int(x) for x in
              os.environ.get("CLPSPARK_SCALING_SIZES", "4,16").split(","))
ROWS = int(os.environ.get("CLPSPARK_BENCH_ROWS", "12000000"))
REPEATS = int(os.environ.get("CLPSPARK_SCALING_REPEATS", "3"))

_CHILD = r"""
import os, sys, time
cpus = int(sys.argv[1]); rows = int(sys.argv[2])
from clpspark.session import get_spark
from clpspark.corpus import build_vocab, write_corpus
from clpspark.operators.parse import parse_sequences
spark = get_spark("parse-scaling", master=f"local[{cpus}]",
                  shuffle_partitions=cpus)
tmp = os.environ.get("CLPSPARK_BENCH_TMP", "/dev/shm/clpspark_bench")
corpus = f"{tmp}/corpus_n{rows}"
if not os.path.exists(f"{corpus}/_SUCCESS"):
    write_corpus(spark, corpus, n_rows=rows, seed=42, partitions=64)
meta = build_vocab(42)
df = spark.read.parquet(corpus)
parse_sequences(df, meta.vocab).count()  # warm JIT + python workers
t0 = time.time()
parse_sequences(df, meta.vocab).count()
print("PARSE_SEC", time.time() - t0)
spark.stop()
"""


def run_once(cpus: int) -> float:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(cpus), str(ROWS)],
        capture_output=True, text=True, timeout=1800,
        env=dict(os.environ, PYTHONPATH=REPO),
    )
    for line in out.stdout.splitlines():
        if line.startswith("PARSE_SEC"):
            return float(line.split()[1])
    print(out.stderr[-2000:], file=sys.stderr)
    raise RuntimeError("no PARSE_SEC in child output")


def main() -> None:
    best: dict[int, float] = {}
    for r in range(REPEATS):
        for cpus in SIZES:
            sec = run_once(cpus)
            print(f"local[{cpus}] run {r}: parse {sec:.2f}s", file=sys.stderr)
            if cpus not in best or sec < best[cpus]:
                best[cpus] = sec
    n, n4 = SIZES
    speedup = best[n] / best[n4]
    eff = speedup / (n4 / n)
    print(json.dumps({
        "metric": "parse-stage scaling (isolated hot loop)",
        "rows": ROWS,
        "sizes": list(SIZES),
        "best_sec": best,
        "speedup": round(speedup, 3),
        "efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
