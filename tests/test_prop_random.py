"""Randomized differential pipeline tests (slim in-suite version of
scripts/hunt_prop.py): deterministic seeds, random small frames through
random op chains, engine vs pandas.  Catches op-interaction bugs
single-shot pins miss (this harness found the reset_index and concat
order-anchor losses, seeds 96/24 of the full sweep)."""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/scripts")

import pytest

import hunt_prop


@pytest.mark.parametrize("seed", list(range(0, 40)))
def test_random_pipeline(seed):
    desc, want, got = hunt_prop.run_case(seed)
    assert hunt_prop.close(want, got), \
        f"seed {seed}: {desc}\nwant={want}\ngot ={got}"
