"""JTS XML conformance corpus (the reference's own test resource).

The reference runs this corpus through jts-test-runner with an explicit
expected-failure list (``jts-test-runner/src/lib.rs:19-50``); this engine
needs none: every supported case passes, including the fixed-precision
(``*Prec*``) overlay files, whose snapped expected outputs are reproduced
by snapping inputs and output to the precision grid with a prepair repair
pass (tools/jts_runner._snap_polys).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.jts_runner import GENERAL, run_corpus

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GENERAL), reason="JTS corpus not available"
)


def test_jts_general_corpus():
    # the ENTIRE general corpus, fixed-precision (Prec) files included —
    # round 2: 471 → 852 and zero failures. +113 full DE-9IM relate
    # (TestRelate{AA,LA,LL,PA,PL,PP} all pass) + matrix predicate fallbacks;
    # +21 interior-connectivity validity rules; +90 geometry distance /
    # isWithinDistance / equalsExact / equalsNorm / isSimple / getBoundary /
    # densify / getInteriorPoint; +157 fixed-precision + OverlayNG +
    # snap-rounding (SR) overlays via hot-pixel snap rounding
    # (kernels.repair.snap_round_rings) composed with the odd-even repair.
    results, failures = run_corpus()
    assert results["pass"] >= 852, (results, failures[:10])
    assert results["fail"] == 0, failures
