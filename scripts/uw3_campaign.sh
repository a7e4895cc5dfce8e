#!/bin/bash
# Round-3 config-3 accuracy campaign (VERDICT.md items 1+2): a recorded,
# reproducible run of the two-stage run-uw3-500 recipe on the real chip,
# plus a controlled augmentation measurement (augment=0 vs 0.5 vs 1.0,
# same seed, same update budget).
#
# Outputs: runs/r3/<name>.log + <name>.jsonl per run, runs/r3/eval.jsonl
# with fresh-200-line CERs, all committed into BASELINE.md afterwards.
set -e
cd "$(dirname "$0")/.."

WORK="${WORK:-/tmp/clstm_uw3_r3}"
OUT="runs/r3"
mkdir -p "$WORK" "$OUT"

# 1. Datasets: the standard 500/50 synthetic UW3 split (seed 0, identical
# to scripts/run-uw3-500) plus a FRESH 200-line held-out set (seed 7).
if [ ! -f "$WORK/train.files" ]; then
python - "$WORK" <<'EOF'
import sys
from clstm_tpu.data.lines import LineGenerator, make_dataset_dir
work = sys.argv[1]
gen = LineGenerator(seed=0)
texts = [gen.random_sentence() for _ in range(550)]
train = make_dataset_dir(f"{work}/train", 500, gen=gen, texts=texts[:500])
test = make_dataset_dir(f"{work}/test", 50, gen=gen, texts=texts[500:])
open(f"{work}/train.files", "w").write(open(train).read())
open(f"{work}/test.files", "w").write(open(test).read())
gen2 = LineGenerator(seed=7)
fresh_texts = [gen2.random_sentence() for _ in range(200)]
fresh = make_dataset_dir(f"{work}/fresh", 200, gen=gen2, texts=fresh_texts)
open(f"{work}/fresh.files", "w").write(open(fresh).read())
print("# datasets ready")
EOF
fi

done_already () {  # name -> 0 if the run finished in a previous session
    [ -f "$OUT/$1.log" ] && grep -q "^# done:" "$OUT/$1.log"
}

stage1 () {  # name augment
    local name="$1" aug="$2"
    if done_already "$name"; then
        echo "=== stage1 $name already done, skipping ==="; return 0
    fi
    echo "=== stage1 $name (augment=$aug) ==="
    save_name="$WORK/$name" ntrain=1000000 lrate=2e-4 nhidden=100 \
    batch_size=32 gradient_clip=10 initial=0.1 target_height=48 \
    report_every=50000 test_every=50000 save_every=100000 randseed=0 \
    augment="$aug" log_jsonl="$OUT/$name.jsonl" \
    python -m clstm_tpu.cli.clstmocrtrain "$WORK/train.files" "$WORK/test.files" \
        > "$OUT/$name.log" 2>&1
    tail -2 "$OUT/$name.log"
}

stage2 () {  # name load_from augment
    local name="$1" from="$2" aug="$3"
    if done_already "$name"; then
        echo "=== stage2 $name already done, skipping ==="; return 0
    fi
    echo "=== stage2 $name (load=$from augment=$aug) ==="
    save_name="$WORK/$name" load="$WORK/$from.clstm" ntrain=1000000 \
    lrate=5e-5 batch_size=32 gradient_clip=10 target_height=48 \
    report_every=50000 test_every=50000 save_every=100000 randseed=1 \
    augment="$aug" log_jsonl="$OUT/$name.jsonl" \
    python -m clstm_tpu.cli.clstmocrtrain "$WORK/train.files" "$WORK/test.files" \
        > "$OUT/$name.log" 2>&1
    tail -2 "$OUT/$name.log"
}

fresh_eval () {  # name
    if [ -f "$OUT/eval.jsonl" ] && grep -q "/$1.clstm" "$OUT/eval.jsonl"; then
        echo "--- fresh eval $1 already recorded ---"; return 0
    fi
    echo "--- fresh eval $1 ---"
    python scripts/eval_cer.py "$WORK/$1.clstm" "$WORK/fresh.files" 50 \
        >> "$OUT/eval.jsonl" 2>"$OUT/eval-$1.err" || cat "$OUT/eval-$1.err"
    tail -1 "$OUT/eval.jsonl"
}

# 2. Stage 1: controlled augmentation triple (same seed/budget).
stage1 s1-aug0  0
stage1 s1-aug05 0.5
stage1 s1-aug1  1.0
fresh_eval s1-aug0
fresh_eval s1-aug05
fresh_eval s1-aug1

# 3. Stage 2: the documented two-stage recipe (augment=0 branch), plus a
# resume from each augmented stage-1 (augment kept on — the winner gets
# recorded as the run-uw3-500 default).
stage2 s2-aug0  s1-aug0  0
stage2 s2-aug05 s1-aug05 0.5
stage2 s2-aug1  s1-aug1  1.0
fresh_eval s2-aug0
fresh_eval s2-aug05
fresh_eval s2-aug1

echo "=== campaign done ==="
cat "$OUT/eval.jsonl"
