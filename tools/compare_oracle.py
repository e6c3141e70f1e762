#!/usr/bin/env python3
"""Compare <dir>/doc*.actual.json (Scala engine) vs doc*.expected.json
(CPython oracle). Exit 1 on any mismatch; prints a focused diff."""
import json
import pathlib
import sys


def main():
    d = pathlib.Path(sys.argv[1])
    bad = 0
    n = 0
    for a in sorted(d.glob("*.actual.json")):
        e = a.with_name(a.name.replace(".actual.", ".expected."))
        act = json.loads(a.read_text(encoding="utf-8"))
        exp = json.loads(e.read_text(encoding="utf-8"))
        n += 1
        # engine text must equal oracle text AND the generator golden
        for key, av, ev in [("text", act["text"], exp["text"]),
                            ("gen_text", act["gen_text"], exp["text"]),
                            ("next", act["next"], exp["next"]),
                            ("questions", act["questions"], exp["questions"])]:
            if av != ev:
                bad += 1
                print(f"MISMATCH {a.name} [{key}]")
                if key == "questions":
                    for i, (x, y) in enumerate(zip(av, ev)):
                        if x != y:
                            print(f"  q[{i}] actual:   {json.dumps(x, ensure_ascii=False)[:400]}")
                            print(f"  q[{i}] expected: {json.dumps(y, ensure_ascii=False)[:400]}")
                            break
                    if len(av) != len(ev):
                        print(f"  len actual={len(av)} expected={len(ev)}")
                else:
                    print(f"  actual:   {str(av)[:300]}")
                    print(f"  expected: {str(ev)[:300]}")
                break
    print(f"compared {n} pages, {bad} mismatches")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
