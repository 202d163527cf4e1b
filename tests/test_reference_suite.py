"""Run the REFERENCE library's own pytest suite against our drop-in.

The north-star correctness gate says results are "checked against
s2cell's own pytest suite". tests/test_scalar.py fuzzes call-by-call
parity against the live reference; THIS test goes one further and runs
the reference's unmodified test file (`/root/reference/tests/
test_s2cell.py`, read in place — nothing copied) with ``s2cell`` aliased
to :mod:`s2cell_spark.scalar` via a pytest plugin injected in a
subprocess. Every assertion the reference ships — error messages,
corpus compat (111,600 encode + decode vectors), canonical-token tables,
validity truth tables — must pass against our implementation.

Deselected: ``test_cell_id_to_neighbor_cell_ids_compat`` only, because
its corpus file is a missing large blob in this checkout
(``/root/reference/.MISSING_LARGE_BLOBS``) — the neighbor surface is
covered by hardcoded-vector parity in the rest of the suite plus our own
IJ-offset re-encode oracle (neighbors_interior).
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF_TESTS = "/root/reference/tests/test_s2cell.py"


def test_reference_pytest_suite_passes_against_dropin(tmp_path):
    plugin = tmp_path / "s2cell_alias_plugin.py"
    plugin.write_text(
        "import sys\n"
        "import s2cell_spark.scalar as m\n"
        "sys.modules['s2cell'] = m\n"
        "sys.modules['s2cell.s2cell'] = m\n"
        "m.s2cell = m\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{tmp_path}{os.pathsep}{REPO}"
    r = subprocess.run(
        [
            sys.executable, "-m", "pytest", REF_TESTS, "-q",
            "-p", "s2cell_alias_plugin", "-p", "no:cacheprovider",
            "-k", "not test_cell_id_to_neighbor_cell_ids_compat",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tmp_path),
        timeout=900,
    )
    assert r.returncode == 0, f"reference suite failed:\n{r.stdout[-4000:]}\n{r.stderr[-2000:]}"
    assert "passed" in r.stdout
