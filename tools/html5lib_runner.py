"""html5lib-tests tree-construction runner.

Drop the published corpus (html5lib/html5lib-tests, tree-construction
``*.dat`` files) into a directory and run:

    python tools/html5lib_runner.py path/to/tree-construction [file.dat ...]

Prints per-file ok/fail counts and a total, in the same spirit as the
reference's runner (/root/reference/examples/html5lib_tests.pl; its
published score is 1647/1666, lib/HTML5/DOM.pod:3318-3377).  The dump
format (perl_html5_dom_spark/dom/treedump.py) matches the corpus
expectations byte-for-byte for the constructs we emit.

The corpus is NOT vendored in this sandbox; until it is dropped in, the
same format + parser are exercised by the hand-derived goldens in
tests/test_tree_goldens.py (run those via pytest).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from perl_html5_dom_spark.dom.treebuilder import TreeBuilder  # noqa: E402
from perl_html5_dom_spark.dom.treedump import tree_format  # noqa: E402


def parse_dat_file(text: str):
    """Yield (data, fragment_context, scripting, expected_dump) per test
    case.  ``scripting`` is True/False when the case pins the flag via
    the corpus's ``#script-on`` / ``#script-off`` directives, else None
    (run with the engine default)."""
    for raw in text.split("\n\n#data\n"):
        block = raw
        if block.startswith("#data\n"):
            block = block[len("#data\n"):]
        if not block.strip():
            continue
        lines = block.split("\n")
        data_lines, document, fragment = [], [], None
        script = None
        mode = "data"
        for ln in lines:
            if ln == "#errors":
                mode = "errors"
            elif ln == "#new-errors":
                mode = "errors"
            elif ln == "#document-fragment":
                mode = "fragment"
            elif ln == "#script-on" or ln == "#script-off":
                script = ln == "#script-on"
            elif ln == "#document":
                mode = "document"
            elif mode == "data":
                data_lines.append(ln)
            elif mode == "fragment":
                fragment = ln.strip()
            elif mode == "document":
                document.append(ln)
        yield ("\n".join(data_lines), fragment, script,
               "\n".join(document).rstrip("\n"))


def run_file(path: Path) -> tuple[int, int, list[str]]:
    ok = fail = 0
    failures: list[str] = []
    for data, fragment, script, expected in parse_dat_file(path.read_text()):
        scripts = True if script is None else script
        try:
            if fragment:
                parts = fragment.split()
                if len(parts) == 2 and parts[0] in ("svg", "math"):
                    from perl_html5_dom_spark.dom.constants import (
                        NS_MATHML, NS_SVG)
                    ns = NS_SVG if parts[0] == "svg" else NS_MATHML
                    doc, frag = TreeBuilder(scripts=scripts).parse_fragment(
                        data, parts[1], ns)
                else:
                    doc, frag = TreeBuilder(scripts=scripts).parse_fragment(
                        data, fragment)
                got = tree_format(doc, frag)
            else:
                got = tree_format(TreeBuilder(scripts=scripts).parse(data))
        except Exception as exc:  # a crash is a failure, not an abort
            got = f"<CRASH {type(exc).__name__}: {exc}>"
        if got == expected:
            ok += 1
        else:
            fail += 1
            failures.append(data[:80])
    return ok, fail, failures


def selftest() -> int:
    """Run the in-repo hand-derived goldens through the SAME .dat loader
    and scoring path the external corpus would take, so a corpus drop-in
    needs zero code changes (just point HTML5LIB_TESTS_DIR at it)."""
    import tempfile

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    import test_tree_goldens as G

    with tempfile.TemporaryDirectory(prefix="html5lib_selftest_") as td:
        # every DAT* family in test_tree_goldens, numerically ordered —
        # a new family is picked up with no change here
        fams = sorted(
            (n for n in dir(G) if re.fullmatch(r"DAT[0-9]*", n)),
            key=lambda n: int(n[3:] or "1"))
        for i, name in enumerate(fams, 1):
            (Path(td) / f"goldens{i:03d}_{name}.dat").write_text(
                getattr(G, name).strip("\n") + "\n")
        total_ok = total_fail = 0
        for f in sorted(Path(td).glob("*.dat")):
            ok, fail, failures = run_file(f)
            total_ok += ok
            total_fail += fail
            print(f"{f.name:32s} ok={ok:4d} fail={fail:3d}")
            for d in failures[:3]:
                print(f"    FAIL: {d!r}")
        print(f"TOTAL ok={total_ok} fail={total_fail} "
              f"({total_ok}/{total_ok + total_fail})")
    return 0 if total_fail == 0 else 1


def main() -> int:
    import os

    if len(sys.argv) >= 2 and sys.argv[1] == "--selftest":
        return selftest()
    if len(sys.argv) >= 2:
        root = Path(sys.argv[1])
        names = sys.argv[2:]
    elif os.environ.get("HTML5LIB_TESTS_DIR"):
        root = Path(os.environ["HTML5LIB_TESTS_DIR"])
        names = []
    else:
        print(__doc__)
        return 2
    files = ([root / n for n in names] if names
             else sorted(root.glob("*.dat")))
    total_ok = total_fail = 0
    for f in files:
        ok, fail, failures = run_file(f)
        total_ok += ok
        total_fail += fail
        print(f"{f.name:32s} ok={ok:4d} fail={fail:3d}")
        for d in failures[:3]:
            print(f"    FAIL: {d!r}")
    print(f"TOTAL ok={total_ok} fail={total_fail} "
          f"({total_ok}/{total_ok + total_fail})")
    return 0 if total_fail == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
