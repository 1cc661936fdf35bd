"""Hardware scaling-ceiling microbenchmarks — NO Spark involved.

Quantifies how much 8→32-core scaling this host can give ANY workload:
(a) a register-only integer loop (pure ALU, no memory traffic), and
(b) the engine's own tokenizer under plain multiprocessing.
The N→4N efficiency of these loops is the ceiling against which the Spark
build's efficiency must be read: Spark cannot out-scale the silicon.

Usage: python tools/hw_ceiling.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spin(n: int) -> int:
    x = 0
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
    return x


def _gen_texts(n: int) -> list[str]:
    import numpy as np

    from clip_as_service_spark.fixtures import _vocabulary

    vocab = _vocabulary(np.random.default_rng(42))
    v = len(vocab)
    ranks = np.arange(1, v + 1, dtype=float)
    p = ranks**-1.3
    p /= p.sum()
    cum = np.cumsum(p)
    va = np.array(vocab, dtype=object)
    rng = np.random.default_rng(7)
    return [
        " ".join(
            va[np.minimum(np.searchsorted(cum, rng.random(200), side="right"), v - 1)]
        )
        for _ in range(n)
    ]


def _tok(args) -> int:
    texts, reps = args
    from collections import Counter

    from clip_as_service_spark.textnorm import tokenize_words

    c = 0
    for _ in range(reps):
        for t in texts:
            c += len(Counter(tokenize_words(t)))
    return c


def _throughput(fn, payload, procs: int, unit_work: float) -> float:
    with mp.Pool(procs) as pool:
        t0 = time.perf_counter()
        pool.map(fn, [payload] * procs)
        dt = time.perf_counter() - t0
    return procs * unit_work / dt


def main() -> None:
    levels = (1, 8, 32)
    out: dict = {"levels": list(levels)}

    spin_n = 20_000_000
    alu = {p: _throughput(_spin, spin_n, p, spin_n) for p in levels}
    out["alu_mops"] = {p: round(v / 1e6, 1) for p, v in alu.items()}
    out["alu_eff_8_to_32"] = round(alu[32] / (4 * alu[8]), 3)

    texts = _gen_texts(2000)
    tok = {p: _throughput(_tok, (texts, 4), p, 4 * len(texts)) for p in levels}
    out["tokenize_docs_per_sec"] = {p: round(v) for p, v in tok.items()}
    out["tokenize_eff_8_to_32"] = round(tok[32] / (4 * tok[8]), 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
