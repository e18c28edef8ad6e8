#!/bin/bash
# Hunt for a clean-window solo >=0.8 pair at 960k docs (supplementary
# evidence beyond the density-matched headline).  Stops at the first pair
# with solo eff >= 0.8 AND pair ceiling >= 0.9 AND steal <= 3% both legs.
set -u
cd /root/repo
export SPARK_GRAFT_SCALE_SRC=/dev/shm/bench_corpus_960k/docs
for i in 3 4 5 6 7 8; do
  out="scale_960k_pair${i}.json"
  hf=$(( i % 2 ))
  echo "[hunt] pair $i (hi_first=$hf) $(date +%T)"
  python bench.py --scale-pair 2 8 960000 "$out" "$hf" > /dev/null 2>&1
  python3 - "$out" <<'EOF'
import json, sys
r = json.load(open(sys.argv[1]))
lo, hi = r['legs']['2'], r['legs']['8']
eff = (lo['wall_sec']/hi['wall_sec'])/4
d = r.get('density')
effm = (d['wall_sec']/hi['wall_sec'])/4 if d else None
clean = (eff <= 1.05 and r['pair_ceiling'] >= 0.9
         and max(lo['steal_pct'], hi['steal_pct']) <= 3.0
         and min(lo.get('probe_mb_s', 1e9), hi.get('probe_mb_s', 1e9)) >= 2500)
print(f"[hunt] {sys.argv[1]}: solo={eff:.3f} matched={effm and round(effm,3)} "
      f"ceiling={r['pair_ceiling']} clean={clean}")
sys.exit(0 if (clean and eff >= 0.8) else 1)
EOF
  [ $? -eq 0 ] && { echo "[hunt] clean solo >=0.8 landed: pair $i"; exit 0; }
done
echo "[hunt] no clean solo >=0.8 pair in this session"
exit 0
