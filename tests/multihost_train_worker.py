"""Worker process for the 4-process multi-host matrix test.

Each worker owns 2 virtual CPU devices of an 8-device global ``data`` mesh
and runs the REAL training loop (``semivl_tpu.train.loop.train``) on a
shared run dir, so the test exercises: multi-host loader sharding, the
in-step psum preemption consensus, mid-epoch checkpoint + exact resume,
and process-sharded eval histogram reduction
(reference supervised.py:154-156 all_reduce equivalent).

Invoked by tests/test_multihost.py:

    python tests/multihost_train_worker.py --process-id I --num-processes N
        --port P --run-dir D --data-root R [--preempt-at-step K]
"""

import argparse
import os
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--process-id', type=int, required=True)
    parser.add_argument('--num-processes', type=int, required=True)
    parser.add_argument('--port', type=int, required=True)
    parser.add_argument('--run-dir', required=True)
    parser.add_argument('--data-root', required=True)
    parser.add_argument('--preempt-at-step', type=int, default=None,
                        help='inject a preemption on process 0 only')
    args = parser.parse_args()

    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                               + ' --xla_force_host_platform_device_count=2')
    import jax
    jax.config.update('jax_platforms', 'cpu')
    # share the repo test compile cache: 4 identical programs -> 1 compile
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_cache_tests')
    os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)
    jax.distributed.initialize(
        coordinator_address=f'127.0.0.1:{args.port}',
        num_processes=args.num_processes, process_id=args.process_id)
    assert jax.device_count() == 2 * args.num_processes

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from semivl_tpu.configs import config_from_vars

    cfg = config_from_vars(
        exp_id=98, model='mmseg.tiny-vlm-test', method='unimatch',
        crop_size=64, batch_size=1, epochs=2, img_scale=None,
        criterion='CELoss', criterion_u='CELoss',
        eval_mode='zegclip_sliding_window')
    cfg['data_root'] = args.data_root
    cfg['stride'] = 48
    cfg['labeled_id_path'] = os.path.join(args.data_root, 'splits',
                                          'labeled.txt')
    cfg['unlabeled_id_path'] = os.path.join(args.data_root, 'splits',
                                            'unlabeled.txt')
    cfg['val_id_path'] = os.path.join(args.data_root, 'splits', 'val.txt')
    cfg['debug_images'] = False
    cfg['preempt_check_every'] = 1
    if args.preempt_at_step is not None and args.process_id == 0:
        # only host 0 "receives the signal": the other hosts must stop via
        # the psum consensus, not a local flag
        cfg['preempt_at_step'] = args.preempt_at_step

    from semivl_tpu.train.loop import train
    best, save_path = train(cfg, seed=0, resume_from=args.run_dir)
    print(f'[host {args.process_id}] done best={best:.4f} '
          f'save_path={save_path}', flush=True)


if __name__ == '__main__':
    main()
