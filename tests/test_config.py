"""Config tests: reference-schema compatibility and roundtrip."""

import json
import os

import pytest

from x2gnn_tpu.config import (
    ModelConfig, TrainConfig, load_configs, dump_configs)

REF_CONFIG = "/root/reference/config.json"


def test_defaults_match_reference_recipe():
    m, t = ModelConfig(), TrainConfig()
    assert (m.conv_layers, m.sbf_dim, m.rbf_dim, m.in_channels,
            m.heads, m.cutoff) == (4, 7, 6, 128, 16, 5.0)
    assert (t.batch_size, t.random_seed, t.max_lr, t.warmup_steps,
            t.decay_steps, t.decay_rate, t.ema_decay, t.max_grad,
            t.max_epoch) == (32, 41, 1e-3, 3000, 3_000_000, 0.01, 0.95,
                             100.0, 800)
    assert t.division == (10000, 20000)


@pytest.mark.skipif(not os.path.exists(REF_CONFIG),
                    reason="reference config not mounted")
def test_loads_actual_reference_config():
    m, t = load_configs(REF_CONFIG)
    assert m.in_channels == 128 and m.heads == 16 and m.sbf_dim == 7
    assert t.batch_size == 32 and t.random_seed == 41
    assert t.division == (10000, 20000)


def test_load_from_dict_partial_override():
    m, t = load_configs({"conv_layers": 2, "max_lr": 5e-4, "junk": 1})
    assert m.conv_layers == 2 and m.in_channels == 128
    assert t.max_lr == 5e-4


def test_dump_and_head_dim(tmp_path):
    m, t = ModelConfig(), TrainConfig()
    path = str(tmp_path / "args.json")
    dump_configs(m, t, path)
    payload = json.load(open(path))
    assert payload["model"]["in_channels"] == 128
    assert payload["train"]["random_seed"] == 41
    assert m.head_dim == 8
