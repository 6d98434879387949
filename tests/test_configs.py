"""Config-generator parity against golden snapshots of the reference output."""

import json
import os

import pytest

from semivl_tpu.configs import (
    config_from_vars,
    generate_experiment_cfgs,
    get_model_config,
)

GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__),
                                     'golden_experiment_cfgs.json')))


@pytest.mark.parametrize('exp_id', [40, 41, 42, 43, 44])
def test_generate_matches_golden(exp_id):
    cfgs = generate_experiment_cfgs(exp_id)
    golden = GOLDEN[str(exp_id)]
    assert len(cfgs) == len(golden)
    for mine, ref in zip(cfgs, golden):
        assert mine['name'] == ref['name']
        for k, v in ref.items():
            got = mine[k]
            if isinstance(v, list) and isinstance(got, tuple):
                got = list(got)
            assert got == v, (exp_id, ref['name'], k, got, v)


def test_default_name():
    cfg = config_from_vars(exp_id=99)
    assert cfg['nclass'] == 21
    assert cfg['stride'] == 426
    assert cfg['name'].startswith('voc-92')


def test_model_configs_resolve():
    for name in ['vlm-vlg-aspp-s2p4-sk04-ftap-mcvitb',
                 'vlm-vlg-aspp-s2p4-skr04-ftap-mcvitb',
                 'vlm-dlv3p-bn12-sk4-ftap-mcvitb',
                 'vlm-dlv3p-bn12-sk4-ft-mcvitb',
                 'vlm-dlv3p-bn11-sk4-ft-tvit-in1k',
                 'vlm-zegclip-rd-pt-vitb',
                 'mcvit16']:
        cfg = get_model_config(name)
        assert cfg['img_size'] == 512
    flagship = get_model_config('mmseg.vlm-vlg-aspp-s2p4-sk04-ftap-mcvitb')
    assert flagship['model']['backbone']['out_indices'] == [0, 4, 12]
    assert flagship['model']['exclude_keys'] == ['attn', 'pos_embed']
    # crop-size override path (reference builder.py:113-118)
    big = get_model_config('vlm-vlg-aspp-s2p4-skr04-ftap-mcvitb', img_size=801)
    assert big['model']['backbone']['img_size'] == (801, 801)
