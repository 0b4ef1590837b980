#!/usr/bin/env bash
# Full-tier suite runner with xdist crash isolation (VERDICT r3 #8):
# an XLA:CPU compiler bug (README "known environment hazards") can
# segfault an xdist worker; the test executing at crash time is then
# reported FAILED even though it passes in isolation.  This wrapper
# runs the suite under -n 2 with worker restarts enabled, then reruns
# any failures serially once — green reruns mean a green suite.
set -u
cd "$(dirname "$0")/.."
ARGS=${*:-tests}
python -m pytest $ARGS -q -n 2 --max-worker-restart=8 \
    --junitxml=/tmp/mt_suite.xml
rc=$?
if [ $rc -eq 0 ]; then
    echo "SUITE GREEN (first pass)"
    exit 0
fi
echo "--- rerunning failures serially (crash isolation) ---"
python - <<'EOF'
import subprocess
import sys
import xml.etree.ElementTree as ET

tree = ET.parse("/tmp/mt_suite.xml")
failed = []
for tc in tree.iter("testcase"):
    if tc.find("failure") is not None or tc.find("error") is not None:
        cls = tc.get("classname", "").replace(".", "/")
        # classname is module path with dots; rebuild the nodeid
        mod = tc.get("classname", "")
        parts = mod.split(".")
        # find the file part (tests.test_x[.Class])
        for i in range(len(parts), 0, -1):
            cand = "/".join(parts[:i]) + ".py"
            import os
            if os.path.exists(cand):
                node = cand
                if i < len(parts):
                    node += "::" + "::".join(parts[i:])
                node += "::" + tc.get("name")
                failed.append(node)
                break
if not failed:
    print("no rerunnable failures parsed; inspect /tmp/mt_suite.xml")
    sys.exit(1)
print(f"rerunning {len(failed)} failed test(s) serially:")
for f in failed:
    print("  ", f)
r = subprocess.run([sys.executable, "-m", "pytest", "-q", *failed])
sys.exit(r.returncode)
EOF
rc=$?
if [ $rc -eq 0 ]; then
    echo "SUITE GREEN (failures passed on serial rerun)"
fi
exit $rc
