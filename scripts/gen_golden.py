"""Regenerate tests/golden_trace.npz after an intentional semantics change.

The golden trace locks seeded env behavior (level layout, physics
trajectories, rewards) on the CPU backend; test_golden.py compares against
it. Run on CPU so the trace matches what CI executes.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tests.test_golden import GOLDEN_PATH, generate_trace  # noqa: E402


def main():
    np.savez(GOLDEN_PATH, **generate_trace())
    print(f"wrote {GOLDEN_PATH}")


if __name__ == "__main__":
    main()
