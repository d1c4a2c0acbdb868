"""Throughput benchmark CLI (reference: scripts/benchmark.py).

Usage: python scripts/benchmark.py [NUM_WORLDS] [NUM_STEPS] [NUM_HIDERS]
       [NUM_SEEKERS] [RESET_CHANCE]

Thin positional-arg front over the single benchmark engine in bench.py
(one code path; VERDICT.md round-1 item 10). Prints env-steps/s =
worlds * steps / elapsed, the reference's FPS metric (reference:
benchmark.py:89-92, headless.cpp:98-102). The paper-parity config is
`16000 1920` with 2v2 (reference README.md:39); RESET_CHANCE triggers
per-step random world resets (reference: benchmark.py:14,31); the batch
renderer has no TPU analogue and is omitted (SURVEY.md §2.4 E11).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import bench_run  # noqa: E402


def main():
    num_worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    num_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    num_hiders = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    num_seekers = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    reset_chance = float(sys.argv[5]) if len(sys.argv) > 5 else 0.0

    fps = bench_run(num_worlds, num_steps, num_hiders, num_seekers,
                    reset_chance=reset_chance,
                    chunk=int(os.environ.get("BENCH_CHUNK", 40)),
                    rand_seed=10)
    print(f"FPS: {fps:.0f}")


if __name__ == "__main__":
    main()
