"""Rehearsal-at-HEAD check (VERDICT r4 #8).

Compares the code state recorded by the last bench rehearsal
(BENCH_EXTRAS.json["rehearsed"], written by bench.py) against the current
HEAD's `geodiffuser_tpu/` tree.  Exits non-zero — loudly — when HEAD's
measured-code tree differs from the rehearsed one or the rehearsal ran
dirty, so a post-rehearsal code commit can never ship unrehearsed silently
(round 4 shipped 517b0b3 after its final rehearsal).

Usage:  python scripts/check_rehearsed.py
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    path = os.path.join(REPO, "BENCH_EXTRAS.json")
    if not os.path.exists(path):
        print("REHEARSAL CHECK: no BENCH_EXTRAS.json — no rehearsal recorded "
              "for this tree yet")
        return 1
    with open(path) as f:
        record = json.load(f)
    rehearsed = record.get("rehearsed")
    if not isinstance(rehearsed, dict):
        print("REHEARSAL CHECK: BENCH_EXTRAS.json predates rehearsal "
              "stamping — re-run bench.py")
        return 1

    head_tree = subprocess.run(
        ["git", "rev-parse", "HEAD:geodiffuser_tpu"], capture_output=True,
        text=True, cwd=REPO).stdout.strip()
    dirty_now = bool(subprocess.run(
        ["git", "status", "--porcelain", "geodiffuser_tpu", "bench.py",
         "__graft_entry__.py"], capture_output=True, text=True,
        cwd=REPO).stdout.strip())

    problems = []
    if rehearsed.get("dirty"):
        problems.append("the rehearsal ran with UNCOMMITTED measured-code "
                        "changes")
    if rehearsed.get("tree") != head_tree:
        problems.append(
            f"HEAD's geodiffuser_tpu/ tree {head_tree[:12]} differs from the "
            f"rehearsed tree {str(rehearsed.get('tree'))[:12]} "
            f"(rehearsed at commit {str(rehearsed.get('commit'))[:12]})")
    if dirty_now:
        problems.append("the working tree has uncommitted measured-code "
                        "changes right now")

    if problems:
        print("REHEARSAL CHECK FAILED:")
        for p in problems:
            print(f"  - {p}")
        print("  -> re-run the cold bench rehearsal (rm -rf .jax_cache "
              ".jax_cache_cpu; timeout 1800 python bench.py) at the final "
              "commit before round end")
        return 1
    print(f"REHEARSAL CHECK OK: HEAD geodiffuser_tpu/ tree matches the "
          f"rehearsed measurement ({record.get('value')}s at commit "
          f"{str(rehearsed.get('commit'))[:12]})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
