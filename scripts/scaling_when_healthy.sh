#!/bin/sh
# Run bench.py --scaling only when the box calibrates healthy
# (hash >= 95 Mitem/s AND mem >= 2.2 GB/s — the band BASELINE.md's
# round-4 healthy readings were taken in). Prints the calibration it
# gated on, then the scaling JSON line.
cd "$(dirname "$0")/.." || exit 1
CAL=$(python bench.py --verify-env 2>/dev/null)
echo "gate: $CAL"
HASH=$(echo "$CAL" | python -c "import json,sys; print(json.load(sys.stdin)['env_calibration']['hash_mitem_per_sec'])")
MEM=$(echo "$CAL" | python -c "import json,sys; print(json.load(sys.stdin)['env_calibration']['mem_gb_per_sec'])")
OK=$(python - "$HASH" "$MEM" <<'EOF'
import sys
print(1 if float(sys.argv[1]) >= 95 and float(sys.argv[2]) >= 2.2 else 0)
EOF
)
if [ "$OK" = "1" ]; then
    python bench.py --scaling
else
    echo "{\"skipped\": \"box degraded (hash $HASH Mitem/s, mem $MEM GB/s)\"}"
    exit 2
fi
