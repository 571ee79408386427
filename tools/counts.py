#!/usr/bin/env python3
"""Generate the close-note coverage line FROM the committed artifacts
(VERDICT r12 #8: typed counts drifted twice — r11 "269 vs 268", r12
"286 vs 285" — so the number is now derived, never typed).

Usage: python3 tools/counts.py <verifyOutDir> [correctness_full.json]

Prints: total gated queries = len(oracle_sql_full.json) + the by-design
signature rows (queries Verify ran that have NO oracle entry), and the
ok/fail split from the correctness artifact if given.
"""
import json, os, sys


def main(out_dir, corr=None):
    full = json.load(open(f"{out_dir}/oracle_sql_full.json"))
    # signature rows = query output dirs Verify produced with no oracle
    ran = sorted(d for d in os.listdir(out_dir)
                 if os.path.isdir(os.path.join(out_dir, d)))
    sig = [q for q in ran if q not in full]
    print(f"oracled queries: {len(full)}")
    print(f"signature-only rows ({len(sig)}): {', '.join(sig)}")
    print(f"TOTAL gated queries: {len(full) + len(sig)}")
    if corr:
        c = json.load(open(corr))
        print(f"correctness artifact: {c['n_ok']} ok, {c['n_fail']} fail "
              f"of {c['n_oracled']} oracled")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
