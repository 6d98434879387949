#!/usr/bin/env python
"""SemiVL-TPU trainer CLI.

Replaces the reference launch stack (scripts/train.sh +
torch.distributed.launch + semivl.py/supervised.py __main__): one process
drives the whole device mesh; the method (semivl / unimatch / supervised)
comes from the config.

Usage:
    python semivl_train.py --config configs/generated/exp-40/<name>.yaml \
        [--pretrained pretrained/clip_vitb16.msgpack] [--seed 0]
"""

import argparse
import os

import yaml


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', type=str, required=True)
    parser.add_argument('--pretrained', type=str, default=None,
                        help='converted CLIP checkpoint (see '
                             'semivl_tpu/tools/convert_clip_weights.py)')
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--max-iters', type=int, default=None,
                        help='cap total iterations (smoke runs)')
    parser.add_argument('--platform', default=None,
                        help="force a JAX platform (e.g. 'cpu'); needed "
                             'because host sitecustomize pins the TPU '
                             'backend over JAX_PLATFORMS')
    parser.add_argument('--resume-from', default=None,
                        help='existing run dir: restore its latest '
                             'checkpoint and continue')
    args = parser.parse_args()

    platform = args.platform or os.environ.get('SEMIVL_PLATFORM')
    if platform:
        import jax
        jax.config.update('jax_platforms', platform)

    from semivl_tpu.train.loop import train

    with open(args.config) as f:
        cfg = yaml.load(f, Loader=yaml.Loader)

    best, save_path = train(cfg, args_dict=vars(args),
                            max_iters_override=args.max_iters,
                            pretrained=args.pretrained, seed=args.seed,
                            resume_from=args.resume_from)
    print(f'best mIoU: {best:.2f} (artifacts in {save_path})')


if __name__ == '__main__':
    main()
