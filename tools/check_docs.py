"""Doc-example checker: every fenced ```python block in the repo's markdown
docs must at least compile; with --run, each block is executed in-process.

Analog of the reference's tasks/src/check_tfhe_docs_are_tested.rs (which
fails CI when a doc snippet is not covered by a test).

Run: python tools/check_docs.py [--run]
"""

import re
import sys

sys.path.insert(0, "/root/repo")  # tool lives in tools/, imports tfhe_tpu

DOCS = ["README.md", "PERF_NOTES.md", "TESTS_TPU.md"]
FENCE = re.compile(r"```python\n(.*?)```", re.DOTALL)


def main() -> int:
    run = "--run" in sys.argv
    bad = 0
    total = 0
    for path in DOCS:
        try:
            text = open(f"/root/repo/{path}").read()
        except FileNotFoundError:
            continue
        for i, block in enumerate(FENCE.findall(text)):
            total += 1
            label = f"{path}#python-block-{i}"
            try:
                code = compile(block, label, "exec")
            except SyntaxError as e:
                print(f"FAIL compile {label}: {e}")
                bad += 1
                continue
            if run:
                try:
                    exec(code, {"__name__": "__doc_check__"})
                except Exception as e:
                    print(f"FAIL run {label}: {e!r}")
                    bad += 1
                    continue
            print(f"ok {label}" + (" (ran)" if run else " (compiled)"))
    print(f"{total - bad}/{total} doc blocks pass")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
