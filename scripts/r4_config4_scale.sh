#!/bin/bash
# Config-4 corpus-scaling probe (round-3 verdict weak #6 / action #5):
# does the ~2.0-2.3% CER plateau recorded by scripts/r3_config4.sh at
# 500 train lines survive more data, i.e. is it a 351-class homoglyph
# ambiguity floor (intrinsic) or just "500 lines is small for 351
# classes" (corpus-limited)?
#
# Same charset builder, rendering profile, vocabulary and fresh-200
# eval as r3_config4.sh — the ONLY variable is the training corpus
# size (2,000 and 5,000 lines vs round 3's 500). Two-stage recipe per
# corpus size: 1M trials warm (lrate=1e-3, the r3 stage-1 winner),
# then 1M cooled (lrate=5e-5) from the stage-1 best.
#
# Recorded result (runs/r4/c4x-*.log, runs/r4/eval.jsonl):
#   lines  stage-1 test/fresh   stage-2 test/fresh
#    500     2.40% / 2.38%        2.09% / 2.32%    (runs/r3, for scale)
#   2000     0.29% / 0.32%        0.17% / 0.19%
#   5000     0.06% / 0.13%        0.12% / 0.11%
# The plateau is corpus-size-limited, NOT an intrinsic ambiguity
# floor: 4x the data cuts stage-2 CER ~12x and 10x cuts it ~20x at
# identical capacity and recipe; at 5,000 lines the cooled stage no
# longer helps (test 0.06->0.12 within noise of ~1-2 chars on the
# 50-line set; fresh 0.13->0.11) — one warm million suffices.
set -e
cd "$(dirname "$0")/.."

WORK="${WORK:-/tmp/clstm_c4_scale}"
OUT="runs/r4"
mkdir -p "$WORK" "$OUT"

if [ ! -f "$WORK/train5000.files" ]; then
python - "$WORK" <<'EOF'
import sys
import unicodedata
from PIL import ImageFont
from clstm_tpu.data.lines import LineGenerator, make_dataset_dir

work = sys.argv[1]

def big_charset(fontpath):
    """Renderable letters/digits, deduped by rendered glyph — same
    builder as scripts/r3_config4.sh (Latin+ext/Greek/Cyrillic)."""
    f = ImageFont.truetype(fontpath, 32)
    out = []
    seen = set()
    for lo, hi in ((0x41, 0x5B), (0x61, 0x7B), (0x30, 0x3A),
                   (0xC0, 0x100), (0x100, 0x180),
                   (0x391, 0x3A2), (0x3A3, 0x3CA), (0x410, 0x450)):
        for cp in range(lo, hi):
            ch = chr(cp)
            if not (unicodedata.category(ch).startswith("L") or ch.isdigit()):
                continue
            m = f.getmask(ch)
            if m.size[0] == 0 or m.size[1] == 0:
                continue
            key = (m.size, bytes(m))
            if key in seen:
                continue
            seen.add(key)
            out.append(ch)
    return "".join(out)

def make_gen(seed):
    g = LineGenerator(seed=seed, fontsize=(30, 34), warp_amp=(0.0, 3.0),
                      noise=0.03)
    serif = [f for f in g.fonts if "Serif" in f]
    g.fonts = serif or g.fonts[:1]
    g.charset = big_charset(g.fonts[0]) + " .,;:'!?-()"
    return g

def vocab(gen, n=600):
    words = []
    letters = [c for c in gen.charset if c.strip() and not c.isdigit()]
    for _ in range(n):
        k = int(gen.rng.randint(2, 9))
        words.append("".join(letters[gen.rng.randint(len(letters))]
                             for _ in range(k)))
    return words

def sentences(gen, words, n):
    outs = []
    for _ in range(n):
        k = int(gen.rng.randint(3, 9))
        s = " ".join(words[gen.rng.randint(len(words))] for _ in range(k))
        if gen.rng.rand() < 0.3:
            s += "."
        outs.append(s)
    return outs

g = make_gen(0)
words = vocab(g)
print("# charset classes:", len(set(g.charset)) + 1)
texts = sentences(g, words, 5050)
for n in (2000, 5000):
    d = make_dataset_dir(f"{work}/train{n}", n, gen=g, texts=texts[:n])
    open(f"{work}/train{n}.files", "w").write(open(d).read())
test = make_dataset_dir(f"{work}/test", 50, gen=g, texts=texts[5000:])
open(f"{work}/test.files", "w").write(open(test).read())
g2 = make_gen(7)
fresh = make_dataset_dir(f"{work}/fresh", 200, gen=g2,
                         texts=sentences(g2, words, 200))
open(f"{work}/fresh.files", "w").write(open(fresh).read())
print("# config-4 scaling datasets ready in", work)
EOF
fi

run () {  # name nlines extra-env...
    local name="$1" nlines="$2"; shift 2
    if [ -f "$OUT/$name.log" ] && grep -q "^# done:" "$OUT/$name.log"; then
        echo "=== $name already done, skipping ==="; return 0
    fi
    echo "=== config-4-scale run $name ($*) ==="
    env save_name="$WORK/$name" net=bidi2 nhidden=200 \
    ntrain=1000000 lrate=1e-3 batch_size=8 gradient_clip=10 initial=0.1 \
    target_height=48 report_every=100000 test_every=100000 \
    save_every=100000 randseed=0 augment=0 log_jsonl="$OUT/$name.jsonl" \
    "$@" \
    python -m clstm_tpu.cli.clstmocrtrain \
        "$WORK/train$nlines.files" "$WORK/test.files" > "$OUT/$name.log" 2>&1
    grep TESTERR "$OUT/$name.log" | tail -2
}

fresh_eval () {  # name
    local name="$1"
    grep -q "$name.clstm" "$OUT/eval.jsonl" 2>/dev/null && return 0
    python scripts/eval_cer.py "$WORK/$name.clstm" "$WORK/fresh.files" \
        2> "$OUT/eval-$name.err" | tee -a "$OUT/eval.jsonl"
}

for N in 2000 5000; do
    run c4x-$N-s1 $N
    run c4x-$N-s2 $N load="$WORK/c4x-$N-s1.clstm" lrate=5e-5 randseed=1
    fresh_eval c4x-$N-s1
    fresh_eval c4x-$N-s2
done
echo "=== config-4 scaling campaign complete ==="
grep -H "TESTERR 1000" "$OUT"/c4x-*.log
cat "$OUT/eval.jsonl"
