"""Guards the driver-rotation ROUND counter (r15 VERDICT finding 2).

`__spark_entry__.py` rotates a 10-slot window of driver-checked queries by
the committed ROUND file. The bump is manual; forgetting it silently
repeats the previous round's slice — the other families wait another round
for a driver hash-check while everything LOOKS green. This test makes the
stall loud: the committed ROUND must be strictly greater than the newest
committed CORRECTNESS_r*.json artifact's round (that artifact records the
slice the driver already checked under the previous ROUND value). It runs
in the default (fast) tier, so both `make test` and `make gate` fail on an
unbumped ROUND.
"""

import glob
import os
import re

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_round_counter_exceeds_committed_artifacts():
    with open(os.path.join(_HERE, "ROUND")) as f:
        round_n = int(f.read().strip())
    ns = [
        int(m.group(1))
        for f in glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json"))
        if (m := re.search(r"_r(\d+)\.json$", f))
    ]
    if not ns:  # fresh checkout without driver artifacts: nothing to stall on
        return
    newest = max(ns)
    assert round_n > newest, (
        f"ROUND file reads {round_n} but CORRECTNESS_r{newest:02d}.json is "
        f"already committed — bump ROUND to {newest + 1} or the driver's "
        "10-slot rotation window silently repeats the previous round's slice"
    )
