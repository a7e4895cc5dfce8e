#!/bin/bash
# Config-4 accuracy campaign (BASELINE.json configs[3]): 2-stack deep
# BIDILSTM (net=bidi2, nhidden=200) on a LARGE-ALPHABET script stand-in.
#
# The reference names Fraktur/Devanagari as the config-4 use case; the
# image's DejaVu fonts have no Fraktur or Devanagari faces, so the
# stand-in renders a ~384-class alphabet — Latin + Latin-1/Extended-A +
# Greek + Cyrillic letters (every glyph verified renderable in DejaVu
# Serif) — with the UW3-faithful rendering profile (one serif face,
# 30-34px, warp<=3px, noise 0.03) so visual acuity is not the binding
# constraint; the ALPHABET SIZE is the variable under test. Text is
# pseudo-natural: sentences over a fixed 600-word vocabulary drawn from
# the large charset (real large-alphabet corpora are redundant word
# streams, not max-entropy char soup).
#
# Runs are fresh processes with the recipe as printed (no unrecorded
# resume chains; the round-1 lesson). Stage 1 probes two warm-up LRs at
# 400k trials (round 1 found deep stacks need a hotter warm-up), the
# winner gets the full 1M-trial two-stage treatment, and every saved
# model is re-evaluated on a FRESH 200-line set (seed 7) by eval_cer.py.
set -e
cd "$(dirname "$0")/.."

WORK="${WORK:-/tmp/clstm_c4}"
OUT="runs/r3"
mkdir -p "$WORK" "$OUT"

if [ ! -f "$WORK/train.files" ]; then
python - "$WORK" <<'EOF'
import sys
import unicodedata
from PIL import ImageFont
from clstm_tpu.data.lines import LineGenerator, make_dataset_dir

work = sys.argv[1]

def big_charset(fontpath):
    """Renderable letters/digits across Latin(+ext)/Greek/Cyrillic,
    DEDUPED BY RENDERED GLYPH: the scripts share homoglyphs (Cyrillic
    а/е/о/р/с/х, Greek Α/Β/Ε... render pixel-identically to Latin in
    DejaVu), which would put an unlearnable ambiguity floor under CER —
    a glyph-recognition model cannot tell identical images apart. Keep
    the first character per distinct glyph bitmap."""
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
texts = sentences(g, words, 550)
train = make_dataset_dir(f"{work}/train", 500, gen=g, texts=texts[:500])
test = make_dataset_dir(f"{work}/test", 50, gen=g, texts=texts[500:])
open(f"{work}/train.files", "w").write(open(train).read())
open(f"{work}/test.files", "w").write(open(test).read())
g2 = make_gen(7)
fresh = make_dataset_dir(f"{work}/fresh", 200, gen=g2,
                         texts=sentences(g2, words, 200))
open(f"{work}/fresh.files", "w").write(open(fresh).read())
print("# config-4 large-alphabet datasets ready in", work)
EOF
fi

run () {  # name extra-env...
    local name="$1"; shift
    if [ -f "$OUT/$name.log" ] && grep -q "^# done:" "$OUT/$name.log"; then
        echo "=== $name already done, skipping ==="; return 0
    fi
    echo "=== config-4 run $name ($*) ==="
    env save_name="$WORK/$name" net=bidi2 nhidden=200 \
    ntrain=400000 lrate=5e-4 batch_size=8 gradient_clip=10 initial=0.1 \
    target_height=48 report_every=100000 test_every=50000 \
    save_every=100000 randseed=0 augment=0 log_jsonl="$OUT/$name.jsonl" \
    "$@" \
    python -m clstm_tpu.cli.clstmocrtrain \
        "$WORK/train.files" "$WORK/test.files" > "$OUT/$name.log" 2>&1
    grep TESTERR "$OUT/$name.log" | tail -2
}

fresh_eval () {  # name
    local name="$1"
    python scripts/eval_cer.py "$WORK/$name.clstm" "$WORK/fresh.files" \
        2> "$OUT/eval-$name.err" | tee -a "$OUT/eval.jsonl"
}

# Stage-1 warm-up LR probes (400k trials).
run c4-lr5e4
run c4-lr1e3 lrate=1e-3
fresh_eval c4-lr5e4
fresh_eval c4-lr1e3

echo "=== probe results ==="
grep -H TESTERR "$OUT"/c4-lr*.log | tail -4
echo "# pick the winner, then: bash scripts/r3_config4.sh full LR"

if [ "$1" = "full" ]; then
    LR="${2:-5e-4}"
    run c4-s1 ntrain=1000000 lrate="$LR"
    run c4-s2 ntrain=1000000 load="$WORK/c4-s1.clstm" lrate=5e-5 randseed=1
    fresh_eval c4-s1
    fresh_eval c4-s2
    # Stage 3: the s2 curve was still falling at 2M trials — one more
    # cooled million.
    run c4-s3 ntrain=1000000 load="$WORK/c4-s2.clstm" lrate=2.5e-5 randseed=2
    fresh_eval c4-s3
fi
