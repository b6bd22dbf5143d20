#!/usr/bin/env bash
# Disk janitor for the sf10 sweep: the 252 result dumps total ~100 GB,
# far over the machine's headroom, but each is only needed until its
# DuckDB oracle row lands. Deletes (a) verify outputs already marked
# PASS/FAIL in the oracle log, (b) streaming sink spools idle >45 min (no live gate runs that long without touching its spool).
cd /root/repo
while true; do
  find /tmp -maxdepth 1 -name 'graft_sink_*' -mmin +45 -exec rm -rf {} + 2>/dev/null
  python3 - <<'PY'
import re, os, shutil
log = '.data/sf10_r15_oracle.log'
out = '.data/verify_sf10_r15'
if os.path.exists(log):
    for ln in open(log):
        m = re.match(r'(PASS|FAIL) (\S+?):? ', ln)
        if m:
            d = os.path.join(out, m.group(2))
            if os.path.isdir(d):
                shutil.rmtree(d, ignore_errors=True)
PY
  sleep 120
done
