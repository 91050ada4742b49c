"""Line coverage for ``fvgp_tpu`` with zero dependencies.

The image has no coverage.py / pytest-cov, but the reference's CI measures
coverage as a release gate (/root/reference/.github/workflows/fvGP-CI.yml:24-50,
codecov.yml) — so this repo carries its own measurer: a ``sys.monitoring``
(PEP 669, Python 3.12+) LINE listener that returns ``DISABLE`` after the
first hit per location, making steady-state overhead near zero.

Executable lines come from walking each module's code objects
(``co_lines``), the same universe coverage.py uses for statement coverage.
Lines excluded: ``# pragma: no cover`` (same convention as the reference).

Usage (wired into tests/conftest.py):

    FVGP_COV=1 python -m pytest tests -q       # report at exit
    make coverage

The report prints per-file and total percentages and writes
``coverage_report.txt`` at the repo root.
"""

import atexit
import os
import sys

_TOOL_ID = 3                     # sys.monitoring tool slots 0-5; 3 is free
_hits = set()                    # {(abspath, lineno)}
_prefix = None


def _on_line(code, lineno):
    fn = code.co_filename
    if fn.startswith(_prefix):
        _hits.add((fn, lineno))
    return sys.monitoring.DISABLE


def install(package_dir=None):
    """Start recording line hits under ``package_dir`` (default: the
    fvgp_tpu package next to this tools/ directory)."""
    global _prefix
    if package_dir is None:
        package_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "fvgp_tpu")
    _prefix = os.path.abspath(package_dir) + os.sep
    mon = sys.monitoring
    mon.use_tool_id(_TOOL_ID, "fvgp_tpu-cov")
    mon.register_callback(_TOOL_ID, mon.events.LINE, _on_line)
    mon.set_events(_TOOL_ID, mon.events.LINE)
    atexit.register(report)


def _executable_lines(path):
    """All statement lines of ``path`` (recursive co_lines walk), minus
    ``# pragma: no cover`` lines."""
    with open(path, encoding="utf-8") as fh:
        src = fh.read()
    try:
        top = compile(src, path, "exec")
    except SyntaxError:
        return set()
    lines = set()
    stack = [top]
    while stack:
        code = stack.pop()
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
        for _, _, ln in code.co_lines():
            if ln is not None and ln > 0:
                lines.add(ln)
    src_lines = src.splitlines()
    pragma = {i + 1 for i, text in enumerate(src_lines)
              if "pragma: no cover" in text}
    # a pragma on a block opener (def/class/if) excludes nothing else here —
    # statement-level exclusion only, matching how this repo uses it
    lines -= pragma
    # module docstrings/`"""` continuation lines appear in co_lines of some
    # builds as line 1 even for empty modules; keep them — they execute.
    return lines


def report(stream=None, write_file=True):
    """Per-file and total line coverage of everything under the package
    that was IMPORTED during the run (unimported files count as 0%)."""
    if _prefix is None:
        return
    out = stream or sys.stderr
    rows = []
    total_exec = total_hit = 0
    pkg_root = _prefix.rstrip(os.sep)
    for dirpath, _, filenames in os.walk(pkg_root):
        if "_build" in dirpath or "__pycache__" in dirpath:
            continue
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            ex = _executable_lines(path)
            if not ex:
                continue
            hit = {ln for (p, ln) in _hits if p == path} & ex
            rows.append((os.path.relpath(path, os.path.dirname(pkg_root)),
                         len(hit), len(ex)))
            total_exec += len(ex)
            total_hit += len(hit)
    lines = ["fvgp_tpu line coverage (stdlib sys.monitoring measurer)", ""]
    for rel, h, e in rows:
        lines.append(f"{rel:55s} {h:5d}/{e:<5d} {100.0 * h / e:6.1f}%")
    pct = 100.0 * total_hit / max(total_exec, 1)
    lines.append("")
    lines.append(f"{'TOTAL':55s} {total_hit:5d}/{total_exec:<5d} {pct:6.1f}%")
    text = "\n".join(lines)
    print(text, file=out)
    if write_file:
        try:
            root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            with open(os.path.join(root, "coverage_report.txt"), "w",
                      encoding="utf-8") as fh:
                fh.write(text + "\n")
            # missed-line detail (compressed ranges) for targeted test work
            with open(os.path.join(root, "coverage_missing.txt"), "w",
                      encoding="utf-8") as fh:
                for dirpath, _, filenames in os.walk(pkg_root):
                    if "_build" in dirpath or "__pycache__" in dirpath:
                        continue
                    for fn in sorted(filenames):
                        if not fn.endswith(".py"):
                            continue
                        path = os.path.join(dirpath, fn)
                        ex = _executable_lines(path)
                        miss = sorted(ex - {ln for (p, ln) in _hits
                                            if p == path})
                        if not miss:
                            continue
                        spans, start = [], None
                        for i, ln in enumerate(miss):
                            if start is None:
                                start = prev = ln
                            elif ln == prev + 1:
                                prev = ln
                            else:
                                spans.append((start, prev))
                                start = prev = ln
                        spans.append((start, prev))
                        rel = os.path.relpath(path,
                                              os.path.dirname(pkg_root))
                        fh.write(rel + ": " + ", ".join(
                            f"{a}" if a == b else f"{a}-{b}"
                            for a, b in spans) + "\n")
        except OSError:
            pass
    return pct
