"""Static guard for the float-portability audit (round 9): no NEW
rounded raw-double group aggregate may enter the plans.

Background: a raw double group sum accumulates in partition order,
which varies between runs — rfm_segments' value hash flipped between
two identical sf0.1 runs before the class was converted to exact
BIGINT unit sums + one shared double division (the q1 idiom), and
engine round()/avg() additionally diverge at decimal half boundaries
(q2 60.27125, gapfill 38.37875).  Every money/real-valued site was
converted in rounds 8-9; the only `F.round(F.(sum|avg)(...))` group
aggregates allowed to remain are the adjudicated-safe classes:

- sums/avgs of INTEGRAL doubles (l_quantity, string lengths): every
  partial stays an exact integer below 2^53, so the result is
  order-free at any combine order;
- window prefix sums (`.over(` in the expression): the frame order is
  total, so the accumulation order is fixed by the plan, not the
  scheduler;
- decimal-cast inputs (`.cast("decimal`): Spark sums decimals
  exactly; the residual cross-engine display cast is deterministic
  per dataset and pinned by CHECK_ALL at both SFs.

A new hit outside these classes means someone wrote a flake — convert
it to the q1 idiom (grep `CAST(round(... * 100) AS BIGINT)` in
plans/relational.py for the template) instead of allowlisting it.
"""

import glob
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (basename, distinguishing substring near the hit) — integral-double
# sites individually adjudicated; everything else must be classed by
# the structural rules below.
INTEGRAL_ALLOWLIST = {
    ("relational.py", 'F.sum("l_quantity")'),     # agg_cube: qty integral
    ("relational2.py", 'F.sum("l_quantity")'),    # cube twin
    ("profile.py", "F.avg(F.length(s))"),         # lengths are integers
}


def _hits():
    paths = (glob.glob(os.path.join(REPO, "storagetapper_spark/plans/*.py"))
             + glob.glob(os.path.join(REPO,
                                      "storagetapper_spark/operators/*.py")))
    found = []
    for path in sorted(paths):
        src = open(path).read()
        for m in re.finditer(r"F\.round\(F\.(sum|avg)\(", src):
            # the full argument expression, bounded generously
            block = src[m.start():m.start() + 260]
            if '.cast("decimal' in block:
                continue  # exact decimal accumulation class
            if ".over(" in block:
                continue  # window frame: totally ordered accumulation
            found.append((os.path.basename(path), block))
    return found


def test_no_new_raw_double_rounded_group_aggregates():
    unexplained = []
    for fname, block in _hits():
        if any(fname == f and snip in block
               for f, snip in INTEGRAL_ALLOWLIST):
            continue
        unexplained.append((fname, block.splitlines()[0:2]))
    assert not unexplained, (
        "new rounded raw-double group aggregate(s) — order-dependent "
        "across runs; use exact integer unit sums + one shared double "
        f"division (the q1 idiom) instead: {unexplained}")
