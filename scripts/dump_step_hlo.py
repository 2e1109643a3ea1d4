"""Dump the compiled BRDF-step HLO and summarize the named fusions that
dominate the profile (fusion.85, convert_reduce_fusion.6/7, ...)."""
import re
import sys

import jax

sys.path.insert(0, "/root/repo")
from scripts.profile_steps import build_step  # noqa: E402

step, state, batch = build_step("brdf", "bfloat16")
txt = step.lower(state, batch).compile().as_text()
open("/tmp/brdf_step.hlo", "w").write(txt)
print(f"HLO chars: {len(txt)}")

want = sys.argv[1:] or ["fusion.85", "convert_reduce_fusion.6",
                        "convert_reduce_fusion.7", "fusion.51",
                        "fusion.1251", "multiply_reduce_fusion",
                        "fusion.2104", "pad_add_fusion.3"]
# print each fusion computation's op mix
for name in want:
    m = re.search(
        rf"^%?{re.escape(name)}(\.clone)? \([^)]*\) -> .*?^}}",
        txt, re.M | re.S,
    )
    if not m:
        # fused_computation for fusion.N
        m2 = re.search(rf'fusion\(\s*', txt)
        print(f"== {name}: computation not found by name; searching call")
        cm = re.search(
            rf"%{re.escape(name)} = .*?fusion\(.*?calls=%?([\w.\-]+)", txt
        )
        if not cm:
            print("   no call site either")
            continue
        comp = cm.group(1)
        m = re.search(
            rf"^%?{re.escape(comp)} \([^)]*\) -> .*?^}}", txt, re.M | re.S
        )
        if not m:
            print(f"   computation {comp} not found")
            continue
    body = m.group(0)
    ops = re.findall(r"= \S+ (\w[\w\-]*)\(", body)
    from collections import Counter

    cnt = Counter(ops)
    shapes = re.findall(r"-> (\S+)", body.splitlines()[0])
    print(f"== {name} -> {shapes}: {dict(cnt.most_common(12))}")
