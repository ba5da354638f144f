"""The rounding-site classifier gate (r10 verdict #5): every
``round(`` site in the query/oracle/operator code must classify as
decimal-exact, continuous, passthrough, quantize-seam, or carry an
explicit ``round-ok:`` pragma — so the cross-engine round(double)
tie class (docs/PARITY_SF01.md) stays dead as the registry evolves.
No Spark session needed: the audit is a pure source scan."""

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "round_audit",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "round_audit.py",
    ),
)
round_audit = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_SPEC and round_audit)


def test_no_unclassified_rounding_sites():
    counts, unclassified = round_audit.audit()
    assert not unclassified, (
        "unclassified rounding sites (convert to functions/exact.py "
        "arithmetic or annotate with `round-ok: <reason>`):\n"
        + "\n".join(unclassified)
    )
    # the audit actually scanned the codebase (sanity floor)
    assert sum(counts.values()) > 250


def test_known_classes_present():
    counts, _ = round_audit.audit()
    for cls in ("decimal-exact", "continuous", "passthrough", "pragma"):
        assert counts[cls] > 0, f"classifier lost the {cls} class"
