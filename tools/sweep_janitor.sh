#!/usr/bin/env bash
# Disk janitor for the sf10 sweep: the 252 result dumps total ~100 GB,
# far over the machine's headroom, but each is only needed until its
# DuckDB oracle row lands. Deletes (a) verify outputs already marked
# PASS/FAIL in the oracle log, (b) streaming sink spools idle >45 min (no live gate runs that long without touching its spool).
#
# Reap-safety: a gate re-verified after a FAIL (fixed code, retry)
# rewrites its dir under the same name — reaping that on the STALE
# verdict line eats the retry mid-write (happened in the round-15
# sweep). The janitor timestamps each gate's verdict lines as it first
# sees them (per-gate line count in a sidecar; a count increase means
# a new verdict landed since the last cycle) and reaps a dir only when
# it was last written BEFORE the gate's newest verdict was seen, with
# one cycle of slack. A dir rewritten after its verdict is left alone
# until the oracle judges the rewrite.
cd /root/repo
LOGS="${JANITOR_LOGS:-.data/sf10_r15_oracle.log .data/sf10_r15_cleanup_oracle.log}"
while true; do
  find /tmp -maxdepth 1 -name 'graft_sink_*' -mmin +45 -exec rm -rf {} + 2>/dev/null
  JANITOR_LOGS="$LOGS" python3 - <<'PY'
import json, os, re, shutil, time
out = '.data/verify_sf10_r15'
seenf = '.data/.janitor_seen.json'
now = time.time()
seen = {}
if os.path.exists(seenf):
    try: seen = json.load(open(seenf))
    except Exception: seen = {}
counts = {}
for log in os.environ.get('JANITOR_LOGS', '').split():
    if os.path.exists(log):
        for ln in open(log):
            m = re.match(r'(PASS|FAIL) (\S+?):? ', ln)
            if m:
                counts[m.group(2)] = counts.get(m.group(2), 0) + 1
for g, n in counts.items():
    st = seen.get(g)
    if st is None or st['n'] < n:
        seen[g] = {'n': n, 't': now}   # new verdict first seen this cycle
        continue
    d = os.path.join(out, g)
    if not os.path.isdir(d):
        continue
    try:
        newest = max((os.path.getmtime(os.path.join(d, f))
                      for f in os.listdir(d)), default=os.path.getmtime(d))
    except OSError:
        continue
    # the verdict was first seen at st['t']; the oracle judged the dir
    # BEFORE that, so anything written after st['t'] - 130 is a retry
    # awaiting a fresh verdict — keep it
    if newest < st['t'] - 130:
        shutil.rmtree(d, ignore_errors=True)
json.dump(seen, open(seenf, 'w'))
PY
  sleep 120
done
