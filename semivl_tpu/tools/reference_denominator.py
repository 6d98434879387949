#!/usr/bin/env python
"""Per-geometry A100 reference-throughput denominators (VERDICT r4 #4).

Extends docs/reference_denominator.md's arithmetic to every shipped
geometry: VOC 512^2 bs2, COCO 512^2 bs1 (N=81), ADE 512^2 bs1 (N=150),
Cityscapes 801^2 bs1 (N=19, skr04 conv-encoder model). The reference
publishes no throughput numbers and cannot run here (no GPU, no mmcv —
BASELINE.md), so the denominator is an arithmetic A100 time model built
from the reference's own facts:

  * pass structure per iteration (semivl.py:228-328): teacher fwd on bs,
    MaskCLIP fwd on 2*bs, two student fwds on 2*bs each — one with the
    FP concat doubling the DECODER batch (builder.py:81-89) — plus
    backward through both student passes;
  * precision: pure fp32 (no autocast anywhere; torch 1.12 defaults
    matmul TF32 OFF, cuDNN conv TF32 ON) -> encoder matmuls at fp32
    cuBLAS rates, decoder convs at TF32 cuDNN rates;
  * per-GPU batch + crop per dataset from experiments.py:373-456.

FLOP model (validated against docs/reference_denominator.md's VOC
numbers, themselves cross-checked against XLA cost_analysis of our fused
step, which performs the same math):

  encoder fwd GFLOP/img  = 12 blocks x (24*L*d^2 + 4*L^2*d) + patch embed
                           + MaskCLIP qkv re-projection + CLIP proj
                           (maskclip_vit.py:110-118, 547-555)
  decoder fwd GFLOP/img  = 82 GF (VOC, from the component enumeration in
                           the round-2 doc) scaled by plane count N/21 and
                           token-grid area (g/32)^2 — every VLG conv is
                           shape-identical across datasets up to those two
                           factors (vlg_head.py:192-251 folds B*N planes).
                           The Cityscapes skr04 conv-encoder stem adds
                           ~4% (folded into the overhead factor).

Scenario rates are IDENTICAL to the adopted VOC bracket (generous 16/60
TF/s +10%, mid 13/30 +20%, conservative 10/15 +35%); the generous
scenario additionally scales analytic FLOPs down by the XLA-measured /
analytic ratio for that geometry (XLA elides work eager torch cannot),
exactly as the round-2 doc did for VOC.

Run:  python -m semivl_tpu.tools.reference_denominator [--json]
"""

import argparse
import json
import math

D = 768
LAYERS = 12
PATCH = 16

# XLA cost_analysis() totals of our fused step per geometry
# (python -m semivl_tpu.tools.flops_accounting --dataset <ds>, round 5)
MEASURED_TFLOPS = {
    'pascal': 7.873,
    'coco': 6.564,
    'ade': 9.603,
    'cityscapes': 12.136,
}

GEOMETRIES = {
    # dataset: (crop, bs_per_gpu, n_planes) — experiments.py:317-456.
    # n_planes is the DECODER plane count: VOC trains with the 21-class
    # single-template embedding (the 98-concept variant is the mcc text),
    # COCO/ADE/Cityscapes with their class counts.
    'pascal': (512, 2, 21),
    'coco': (512, 1, 81),
    'ade': (512, 1, 150),
    'cityscapes': (801, 1, 19),
}

SCENARIOS = {
    # name: (enc TF/s fp32 cuBLAS, dec TF/s TF32 cuDNN, overhead)
    'generous': (16.0, 60.0, 0.10),
    'mid': (13.0, 30.0, 0.20),
    'conservative': (10.0, 15.0, 0.35),
}


def tokens(crop):
    """ViT-B/16 token count incl. cls (bicubic pos-embed resize pads the
    grid up: 512 -> 32^2+1 = 1025, 801 -> 51^2+1 = 2602)."""
    return math.ceil(crop / PATCH) ** 2 + 1


def encoder_fwd_gflop_per_img(crop):
    L = tokens(crop)
    per_block = 24 * L * D * D + 4 * L * L * D
    patch_embed = 2 * L * D * (3 * PATCH * PATCH)
    qkv_reproj = 12 * L * D * D          # final-layer q,k,v re-proj + out
    clip_proj = 2 * L * D * 512
    return (LAYERS * per_block + patch_embed + qkv_reproj + clip_proj) / 1e9


def decoder_fwd_gflop_per_img(crop, n_planes):
    g = math.ceil(crop / PATCH)
    return 82.0 * (n_planes / 21.0) * (g / 32.0) ** 2


def analytic_iter_flops(dataset):
    """(enc_gflop, dec_gflop) per iteration, analytic basis."""
    crop, bs, n = GEOMETRIES[dataset]
    enc_fwd = encoder_fwd_gflop_per_img(crop)
    dec_fwd = decoder_fwd_gflop_per_img(crop, n)
    # img-equivs per iter (all linear in bs): enc fwd 7*bs (teacher 1 +
    # maskclip 2 + students 2+2), enc bwd 4*bs at x1.7 (FFN wgrads
    # skipped: frozen); dec fwd 7*bs (FP concat doubles the first student
    # pass: 1 + 0 + 4 + 2), dec bwd 6*bs at x2.
    enc = enc_fwd * (7 * bs + 1.7 * 4 * bs)
    dec = dec_fwd * (7 * bs + 2.0 * 6 * bs)
    return enc, dec


def denominators(dataset, measured_tflops=None):
    crop, bs, n = GEOMETRIES[dataset]
    enc, dec = analytic_iter_flops(dataset)
    analytic_total = enc + dec
    measured = measured_tflops
    if measured is None:
        measured = MEASURED_TFLOPS.get(dataset)
    out = {'dataset': dataset, 'crop': crop, 'batch_per_gpu': bs,
           'n_planes': n, 'tokens': tokens(crop),
           'enc_gflop_per_iter': round(enc, 1),
           'dec_gflop_per_iter': round(dec, 1),
           'analytic_tflop_per_iter': round(analytic_total / 1e3, 3),
           'measured_tflop_per_iter': measured}
    imgs_per_iter = 2 * bs
    for name, (enc_rate, dec_rate, overhead) in SCENARIOS.items():
        scale = 1.0
        if name == 'generous' and measured:
            scale = min(1.0, measured * 1e3 / analytic_total)
        t = (enc * scale / (enc_rate * 1e3)
             + dec * scale / (dec_rate * 1e3)) * (1 + overhead)
        out[name] = round(imgs_per_iter / t, 2)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--json', action='store_true')
    parser.add_argument('--measured', default=None,
                        help='JSON dict dataset->measured TFLOP/iter '
                             '(overrides the baked-in cost_analysis runs)')
    args = parser.parse_args()
    measured = json.loads(args.measured) if args.measured else {}

    rows = [denominators(ds, measured.get(ds)) for ds in GEOMETRIES]
    if args.json:
        print(json.dumps(rows, indent=1))
        return
    print(f'{"dataset":>11} {"crop":>5} {"bs":>3} {"N":>4} {"L":>5} '
          f'{"enc TF":>7} {"dec TF":>7} | {"generous":>8} {"mid":>6} '
          f'{"conserv":>8}   (imgs/sec per A100)')
    for r in rows:
        print(f'{r["dataset"]:>11} {r["crop"]:>5} {r["batch_per_gpu"]:>3} '
              f'{r["n_planes"]:>4} {r["tokens"]:>5} '
              f'{r["enc_gflop_per_iter"] / 1e3:>7.2f} '
              f'{r["dec_gflop_per_iter"] / 1e3:>7.2f} | '
              f'{r["generous"]:>8.2f} {r["mid"]:>6.2f} '
              f'{r["conservative"]:>8.2f}')


if __name__ == '__main__':
    main()
