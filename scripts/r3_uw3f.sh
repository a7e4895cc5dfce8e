#!/bin/bash
# Round-3 <1%-CER campaign on the UW3-faithful profile (VERDICT item 1).
#
# Rationale (probe evidence, runs/r3/p-*.log, anchor s1-aug0 = 6.42% test
# CER at 400k trials):
#   - data profile is the dominant lever: the default stand-in (3 fonts x
#     24-40px x 6px warp) is strictly harder than real UW3-500 (ONE
#     scanned book: one serif typeface, consistent size). The faithful
#     single-serif profile (p-uw3f) reads 2.50% at 400k and falling.
#   - update count is the second lever: batch=8 lr=1e-4 (p-bs8, 50k
#     updates vs 12.5k) reads 4.28% vs the 6.42% anchor.
# This campaign combines both: uw3f profile, B=8 lr=1e-4 (125k updates
# per 1M trials), two stages with lr cooling, controlled augment pair.
set -e
cd "$(dirname "$0")/.."

WORK="${WORK:-/tmp/clstm_uw3_r3}"
OUT="runs/r3"
mkdir -p "$WORK" "$OUT"

# UW3-faithful datasets (shared with scripts/r3_probes.sh): single serif
# font, 30-34px, warp<=3, noise 0.03; 500/50 split seed 0; fresh 200-line
# held-out set seed 7.
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

done_already () { [ -f "$OUT/$1.log" ] && grep -q "^# done:" "$OUT/$1.log"; }

run () {  # name extra-env...
    local name="$1"; shift
    if done_already "$name"; then
        echo "=== $name already done, skipping ==="; return 0
    fi
    echo "=== run $name ($*) ==="
    env save_name="$WORK/$name" ntrain=1000000 lrate=1e-4 nhidden=100 \
    batch_size=8 gradient_clip=10 initial=0.1 target_height=48 \
    report_every=100000 test_every=50000 save_every=100000 randseed=0 \
    augment=0 log_jsonl="$OUT/$name.jsonl" "$@" \
    python -m clstm_tpu.cli.clstmocrtrain \
        "$WORK/uw3f-train.files" "$WORK/uw3f-test.files" \
        > "$OUT/$name.log" 2>&1
    grep TESTERR "$OUT/$name.log" | tail -3
}

fresh_eval () {
    if [ -f "$OUT/eval.jsonl" ] && grep -q "/$1.clstm" "$OUT/eval.jsonl"; then
        echo "--- fresh eval $1 already recorded ---"; return 0
    fi
    echo "--- fresh eval $1 ---"
    python scripts/eval_cer.py "$WORK/$1.clstm" "$WORK/uw3f-fresh.files" 50 \
        >> "$OUT/eval.jsonl" 2>"$OUT/eval-$1.err" || cat "$OUT/eval-$1.err"
    tail -1 "$OUT/eval.jsonl"
}

# Stage 1: B=8 lr=1e-4, augment pair.
run u1-aug0
run u1-aug05 augment=0.5
fresh_eval u1-aug0
fresh_eval u1-aug05

# Stage 2: cool to lr=2.5e-5 from each stage-1 endpoint.
run u2-aug0  load="$WORK/u1-aug0.clstm"  lrate=2.5e-5 randseed=1
run u2-aug05 load="$WORK/u1-aug05.clstm" lrate=2.5e-5 randseed=1 augment=0.5
fresh_eval u2-aug0
fresh_eval u2-aug05

echo "=== uw3f campaign done ==="
grep uw3f-fresh "$OUT/eval.jsonl" || true
