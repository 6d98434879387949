#!/usr/bin/env python
"""Multi-host smoke test: 2 processes x 4 virtual CPU devices each run ONE
fused supervised train step over an 8-device global mesh and verify the
loss agrees across hosts (i.e. grads were pmean'd over DCN-equivalent
process boundaries).

    python -m semivl_tpu.tools.multihost_smoke          # spawns 2 workers
    python -m semivl_tpu.tools.multihost_smoke --worker <id>  # internal
"""

import argparse
import os
import subprocess
import sys


def worker(process_id, num_processes, port):
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                               + ' --xla_force_host_platform_device_count=4')
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.distributed.initialize(coordinator_address=f'127.0.0.1:{port}',
                               num_processes=num_processes,
                               process_id=process_id)
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), 'tests'))
    from tiny_model import tiny_bundle
    from semivl_tpu.parallel.mesh import (
        global_batch_to_device, make_data_mesh)
    from semivl_tpu.train.optim import build_optimizer
    from semivl_tpu.train.step import (
        TrainState, make_supervised_train_step, replicate)

    assert jax.device_count() == 4 * num_processes
    mesh = make_data_mesh()

    bundle = tiny_bundle(num_classes=5, img_size=64, with_mcc=False)
    text = bundle.text_feats
    variables = bundle.module.init(
        {'params': jax.random.PRNGKey(0), 'fp': jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 64, 3)), jnp.asarray(text),
        method='init_variables')
    cfg = dict(criterion=dict(name='CELoss', kwargs={}),
               optimizer=dict(type='AdamW', lr=1e-3, weight_decay=0.01,
                              paramwise_cfg=dict(custom_keys={})),
               warmup_iters=0, warmup_ratio=1e-6)
    tx, _, mask = build_optimizer(cfg, variables['params'], total_iters=10,
                                  freeze_backbone=True,
                                  exclude_keys=['attn', 'pos_embed'])
    state = replicate(TrainState(
        params=variables, opt_state=tx.init(variables['params']),
        step=jnp.zeros((), jnp.int32)), mesh)
    step_fn = make_supervised_train_step(bundle, cfg, tx, mesh, mask)

    # each host contributes DIFFERENT local data (4 samples of global 8)
    rs = np.random.RandomState(100 + process_id)
    local = dict(img=rs.randn(4, 64, 64, 3).astype(np.float32),
                 mask=rs.randint(0, 5, (4, 64, 64)).astype(np.int32))
    batch = global_batch_to_device(local, mesh)
    key = replicate(jax.random.PRNGKey(0), mesh)
    new_state, metrics = step_fn(state, batch, key)
    loss = float(np.asarray(metrics['loss_all']))
    print(f'[host {process_id}] loss={loss:.6f} '
          f'step={int(np.asarray(new_state.step))}', flush=True)
    assert np.isfinite(loss)

    # sharded evaluation: strided val split + histogram allgather must equal
    # a full local evaluation (reference supervised.py:154-156 all_reduce)
    import tempfile
    from synth_data import make_synth_dataset, synth_cfg
    from semivl_tpu.data.dataset import SemiDataset
    from semivl_tpu.evaluation.predict import Evaluator, evaluate
    root = os.path.join(tempfile.gettempdir(),
                        f'mh_smoke_eval_{process_id}')
    paths = make_synth_dataset(root, n_val=4, size=(72, 88), seed=0)
    cfg_e = synth_cfg(root, crop_size=64)
    cfg_e['nclass'] = 5
    cfg_e['stride'] = 48
    ds = SemiDataset(cfg_e, 'val', id_path=paths['val'])
    # variables' buffers were donated to the train step — use the updated
    # params from new_state
    ev = Evaluator(bundle.module, jax.device_get(new_state.params),
                   bundle.text_feats, cfg_e)
    miou_full, _ = evaluate(ev, ds, 'zegclip_sliding_window', cfg_e)
    miou_shard, _ = evaluate(ev, ds, 'zegclip_sliding_window', cfg_e,
                             process_index=process_id,
                             process_count=num_processes)
    print(f'[host {process_id}] miou_full={miou_full:.6f} '
          f'miou_sharded={miou_shard:.6f}', flush=True)
    assert abs(miou_full - miou_shard) < 1e-4, (miou_full, miou_shard)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--worker', type=int, default=None)
    parser.add_argument('--num-processes', type=int, default=2)
    parser.add_argument('--port', type=int, default=29511)
    args = parser.parse_args()
    if args.worker is not None:
        worker(args.worker, args.num_processes, args.port)
        return
    procs = [subprocess.Popen(
        [sys.executable, '-m', 'semivl_tpu.tools.multihost_smoke',
         '--worker', str(i), '--num-processes', str(args.num_processes),
         '--port', str(args.port)],
        env={**os.environ, 'JAX_PLATFORMS': 'cpu'})
        for i in range(args.num_processes)]
    rcs = [p.wait(timeout=900) for p in procs]
    assert all(rc == 0 for rc in rcs), rcs
    print('multihost smoke: OK')


if __name__ == '__main__':
    main()
