"""JTS XML conformance corpus (the reference's own test resource).

The reference runs this corpus through jts-test-runner with an explicit
expected-failure list (``jts-test-runner/src/lib.rs:19-50``); we do the
same. Precision-model files (``*Prec*``) are excluded — their expected
outputs are snapped to an integer grid, which an exact-arithmetic overlay
intentionally does not reproduce.

Current gate (frozen): ≥ 470 passing cases, and every failure is an
``isValid`` case exercising interior-connectivity / multipolygon shell
rules the engine's validator does not implement (documented in
COVERAGE.md: MakeValid 🟡).
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
    files = {
        f for f in os.listdir(GENERAL) if f.endswith(".xml") and "Prec" not in f
    }
    results, failures = run_corpus(files)
    # 584 as of round 2: +113 over round 1 from the full DE-9IM relate
    # (TestRelate{AA,LA,LL,PA,PL,PP} all pass) and matrix-based
    # contains/within/covers/coveredby fallbacks for line operands
    assert results["pass"] >= 584, (results, failures[:10])
    # every failure must be a known validity-semantics gap
    assert all(op == "isvalid" for (_, _, op) in failures), [
        f for f in failures if f[2] != "isvalid"
    ]
    assert results["fail"] <= 22, failures
