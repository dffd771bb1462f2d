"""Plan-shape regression gate (VERDICT r5 item 5).

The round-5 unpartitioned-ntile findings (equidepth_histogram,
rfm_segments) were invisible to the correctness gate AND the sf0.1
bench — both ops were sub-second at test scale while planning a
single-partition sort of the whole input. Only a plan read catches the
class, so the read is automated here: every catalog key's physical plan
is walked and the scale-breaking shapes fail the suite.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.audit_plans import shape_violations


def test_no_scale_breaking_plan_shapes(spark, sf_dir):
    problems = shape_violations(spark, sf_dir)
    assert not problems, "\n".join(problems)
