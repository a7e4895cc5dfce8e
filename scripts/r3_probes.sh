#!/bin/bash
# Round-3 CER-lever probes (short 400k-trial runs, compared against the
# s1-aug0 anchor 0.0642 test CER @400k): which lever moves the config-3
# plateau (~2.5-2.8%) toward the <1% bar?
#   p-nh200      capacity: nhidden=200 (reference env knob)
#   p-bs8        update count/noise: batch_size=8, lrate=1e-4 (ref-like)
#   p-uw3f       UW3-faithful data profile: ONE serif font, consistent
#                size, mild warp — real UW3-500 is one scanned book; the
#                default stand-in (3 fonts x 24-40px x 6px warp) is a
#                strictly harder task than the reference benchmark.
#   p-nh200a     nhidden=200 + augment=0.5
set -e
cd "$(dirname "$0")/.."

WORK="${WORK:-/tmp/clstm_uw3_r3}"
OUT="runs/r3"
mkdir -p "$WORK" "$OUT"

# UW3-faithful dataset (single serif font, 30-34px, warp<=3) + fresh set.
if [ ! -f "$WORK/uw3f-train.files" ]; then
python - "$WORK" <<'EOF'
import sys
from clstm_tpu.data.lines import LineGenerator, make_dataset_dir

def faithful(seed):
    g = LineGenerator(seed=seed, fontsize=(30, 34), warp_amp=(0.0, 3.0),
                      noise=0.03)
    serif = [f for f in g.fonts if "Serif" in f]
    g.fonts = serif or g.fonts[:1]
    return g

work = sys.argv[1]
g = faithful(0)
texts = [g.random_sentence() for _ in range(550)]
train = make_dataset_dir(f"{work}/uw3f-train", 500, gen=g, texts=texts[:500])
test = make_dataset_dir(f"{work}/uw3f-test", 50, gen=g, texts=texts[500:])
open(f"{work}/uw3f-train.files", "w").write(open(train).read())
open(f"{work}/uw3f-test.files", "w").write(open(test).read())
g2 = faithful(7)
ftexts = [g2.random_sentence() for _ in range(200)]
fresh = make_dataset_dir(f"{work}/uw3f-fresh", 200, gen=g2, texts=ftexts)
open(f"{work}/uw3f-fresh.files", "w").write(open(fresh).read())
print("# uw3f datasets ready")
EOF
fi

probe () {  # name extra-env... (train/test files from $PFX)
    local name="$1"; shift
    if [ -f "$OUT/$name.log" ] && grep -q "^# done:" "$OUT/$name.log"; then
        echo "=== probe $name already done, skipping ==="; return 0
    fi
    echo "=== probe $name ($*) ==="
    env save_name="$WORK/$name" ntrain=400000 lrate=2e-4 nhidden=100 \
    batch_size=32 gradient_clip=10 initial=0.1 target_height=48 \
    report_every=50000 test_every=50000 save_every=200000 randseed=0 \
    augment=0 log_jsonl="$OUT/$name.jsonl" "$@" \
    python -m clstm_tpu.cli.clstmocrtrain \
        "$WORK/${PFX}train.files" "$WORK/${PFX}test.files" \
        > "$OUT/$name.log" 2>&1
    grep TESTERR "$OUT/$name.log" | tail -3
}

PFX="" probe p-nh200  nhidden=200
PFX="" probe p-bs8    batch_size=8 lrate=1e-4
PFX="uw3f-" probe p-uw3f
PFX="" probe p-nh200a nhidden=200 augment=0.5
PFX="" probe p-bidi2  net=bidi2 nhidden=200 lrate=1e-3
# Update-count hypothesis (round-2 finding 4): resume s1-aug0 (2.76% at
# 31k updates) for 1M more trials at full/half LR — does the flat-LR
# curve keep falling, or is 5e-5-style cooling (s2: 2.54%) the binding
# choice?
PFX="" probe p-long ntrain=1000000 load="$WORK/s1-aug0.clstm" lrate=2e-4 randseed=2
PFX="" probe p-mid  ntrain=1000000 load="$WORK/s1-aug0.clstm" lrate=1e-4 randseed=3

echo "=== probes done ==="
grep -H TESTERR "$OUT"/p-*.log | awk -F'[: ]' '{print $1, $3, $4}' | sort
