"""Zero-dependency line-coverage pytest plugin (sys.monitoring, 3.12+).

The dev box cannot ``pip install`` pytest-cov (CLAUDE.md: no installs), but
the CI coverage floor (``--cov-fail-under`` in ``.github/workflows/ci.yml``)
must track a MEASURED number, not a guess. This plugin approximates
coverage.py's line metric closely enough to set/ratchet that floor:

    python -m pytest tests/ -q -p tools.line_cov

Each first execution of a package line records it and returns
``sys.monitoring.DISABLE`` for that location, so the steady-state overhead
is near zero. The denominator is the set of line numbers carried by the
compiled code objects of each package module (what coverage.py calls
"arcs' line starts"), which over-counts slightly vs coverage.py (it has
pragma exclusions) — i.e. this reports a LOWER bound on the pytest-cov
percentage.

Writes ``/tmp/mini_mcmc_tpu_linecov.json`` and prints a per-file summary.
"""

from __future__ import annotations

import dis
import json
import sys
import types
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "mini_mcmc_tpu"
_hits: dict[str, set[int]] = {}


_PKG_PREFIX = str(PKG)
_DISABLE = sys.monitoring.DISABLE  # bound at import: at interpreter
# shutdown the module global ``sys`` may already be None


def _on_line(code, lineno):
    fn = code.co_filename
    if fn.startswith(_PKG_PREFIX):
        _hits.setdefault(fn, set()).add(lineno)
    return _DISABLE


def pytest_configure(config):
    mon = sys.monitoring
    mon.use_tool_id(mon.COVERAGE_ID, "line_cov")
    mon.register_callback(mon.COVERAGE_ID, mon.events.LINE, _on_line)
    mon.set_events(mon.COVERAGE_ID, mon.events.LINE)


def _executable_lines(path: Path) -> set[int]:
    code = compile(path.read_text(), str(path), "exec")
    lines: set[int] = set()
    stack = [code]
    while stack:
        c = stack.pop()
        lines.update(
            ln for _, ln in dis.findlinestarts(c) if ln and ln > 0
        )
        stack.extend(
            k for k in c.co_consts if isinstance(k, types.CodeType)
        )
    return lines


def pytest_terminal_summary(terminalreporter):
    rows = []
    tot_hit = tot_all = 0
    for path in sorted(PKG.rglob("*.py")):
        want = _executable_lines(path)
        got = _hits.get(str(path), set()) & want
        tot_hit += len(got)
        tot_all += len(want)
        pct = 100.0 * len(got) / len(want) if want else 100.0
        rows.append((str(path.relative_to(PKG.parent)), len(got),
                     len(want), round(pct, 1)))
    total_pct = 100.0 * tot_hit / tot_all if tot_all else 100.0
    out = {"total_pct": round(total_pct, 2), "files": rows}
    Path("/tmp/mini_mcmc_tpu_linecov.json").write_text(json.dumps(out))
    tw = terminalreporter
    tw.write_sep("-", "line coverage (tools/line_cov.py approximation)")
    for name, hit, all_, pct in rows:
        if pct < 101:
            tw.write_line(f"{name:55s} {hit:5d}/{all_:5d} {pct:6.1f}%")
    tw.write_line(f"{'TOTAL':55s} {tot_hit:5d}/{tot_all:5d} "
                  f"{total_pct:6.1f}%")
