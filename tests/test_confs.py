"""Every conf shipped in confs/ must build through the real loaders.

The reference treats its confs/ directory as the user-facing API surface
(reference dpt_runner.py:567-575 loads them verbatim); ours additionally
carries the TPU production recipes (womsk_white_tpu.conf, wmask_tpu.conf).
These tests pin two things:

1. each conf parses and builds TrainConfig + NeuSNetworks without a
   dataset on disk (the conf->config plumbing, template substitution
   included);
2. the production recipes' internal consistency rules — the ones the
   convergence A/Bs established (docs/RESAMPLE_AB_CPU.json): a reduced
   render core must come with a phased onset, and mask-free womsk
   training must NOT ship the resampled core by default.
"""

import glob
import os

import pytest

from vdnerf_tpu.train.builder import build_networks
from vdnerf_tpu.train.config import TrainConfig
from vdnerf_tpu.utils.hocon import load_conf

CONF_DIR = os.path.join(os.path.dirname(__file__), "..", "confs")
ALL_CONFS = sorted(glob.glob(os.path.join(CONF_DIR, "*.conf")))


def _load(path):
    return load_conf(path, "testcase", "image", "womsk")


@pytest.mark.parametrize("path", ALL_CONFS, ids=[os.path.basename(p) for p in ALL_CONFS])
def test_conf_builds(path):
    conf = _load(path)
    tcfg = TrainConfig.from_conf(conf)
    nets = build_networks(conf, tcfg.extract_depth)

    # reference conf surface invariants (womsk_white.conf:47-89)
    assert tcfg.end_iter > 0 and tcfg.batch_size > 0
    assert nets.renderer.n_samples > 0
    # template substitution actually happened
    assert "CASE_NAME" not in conf.get_string("general.base_exp_dir")

    # a reduced with-gradient core narrower than the ladder, never wider
    ladder = nets.renderer.n_samples + nets.renderer.n_importance
    if nets.renderer.n_render_samples:
        assert 0 < nets.renderer.n_render_samples < ladder
        # production guidance: phased onset required for training confs
        # (from-zero resampling degrades convergence; PERF_r03.md section 4)
        assert tcfg.resample_from > 0
        assert tcfg.resample_from < tcfg.end_iter


def test_wmask_tpu_recipe():
    conf = _load(os.path.join(CONF_DIR, "wmask_tpu.conf"))
    tcfg = TrainConfig.from_conf(conf)
    nets = build_networks(conf, tcfg.extract_depth)
    assert tcfg.use_mask and tcfg.mask_weight > 0
    assert nets.renderer.n_outside == 0  # NeuS wmask: no background NeRF
    # the regime where the resampled core is convergence-validated: ON
    assert nets.renderer.n_render_samples == 64
    assert tcfg.resample_from == 50000  # after the anneal


def test_womsk_tpu_recipe():
    conf = _load(os.path.join(CONF_DIR, "womsk_white_tpu.conf"))
    tcfg = TrainConfig.from_conf(conf)
    nets = build_networks(conf, tcfg.extract_depth)
    assert not tcfg.use_mask and tcfg.mask_weight == 0
    assert nets.renderer.skip_bg_inside  # convergence-validated fast path
    # mask-free training is floor-sensitive (womsk_floor_sweep: -2.3 dB at
    # the default floor) -> the conf ships the TUNED operating point:
    # 96-of-128 PURE-uniform (frac=1.0), validated at flagship dims on the
    # chip (docs/FLAGSHIP_r04_womsk_tuned.json: +1.4 dB iso-iteration,
    # Chamfer parity, 1.6x faster than the faithful core)
    assert nets.renderer.n_render_samples == 96
    assert nets.renderer.resample_uniform_frac == 1.0
    assert tcfg.resample_from == 50000  # after the anneal
    # identical model dims to the reference's womsk_white.conf
    ref = _load(os.path.join(CONF_DIR, "womsk_white.conf"))
    for key in ("n_samples", "n_importance", "n_outside", "up_sample_steps"):
        assert conf["model"]["neus_renderer"][key] == \
            ref["model"]["neus_renderer"][key]
    assert conf["model"]["sdf_network"].to_dict() == \
        ref["model"]["sdf_network"].to_dict()


def test_wdepth_tpu_recipe():
    conf = _load(os.path.join(CONF_DIR, "womsk_white_wdepth_tpu.conf"))
    tcfg = TrainConfig.from_conf(conf)
    nets = build_networks(conf, tcfg.extract_depth)
    # the distillation leg, with the knobs its at-scale evidence covers:
    assert tcfg.extract_depth and not tcfg.use_mask
    # every r3/r4 cycle trained its wdepth leg with fast-bg ON
    # (tools/vdn_cycle_run.py BASE_CONF; docs/VDN_CYCLE_r04_*.json)
    assert nets.renderer.skip_bg_inside
    # round-4 dose-response operating point (GEOMETRY_r04 section 6:
    # arch w=10 Chamfer 0.0098 watertight where w=3 leaves 0.162;
    # camlight safety arm 0.0124 -> 0.0092 — monotone on both families)
    assert tcfg.depth_loss_scale == 10
    # the resampled core ships ON since round 5: the at-scale camlight
    # distillation A/B against the same wavelet teacher is parity-or-better
    # on every axis (docs/VDN_CYCLE_r05_camlight_w10{,_rs96}.json; Chamfer
    # 0.009242 -> 0.009161, identical export error). Mask-free regimes need
    # the pure-uniform floor, and the onset must sit past the fully-ramped
    # distillation schedule (depth_start_iter + 5000-iter ramp)
    assert nets.renderer.n_render_samples == 96
    assert nets.renderer.resample_uniform_frac == 1.0
    assert tcfg.resample_from >= tcfg.depth_start_iter + 5000
    # reference-parity schedule anchors (dpt_runner.py:167-171 fixed ramp)
    assert tcfg.depth_start_iter == 5000
    # identical model dims to the reference's womsk_white_wdepth.conf
    ref = _load(os.path.join(CONF_DIR, "womsk_white_wdepth.conf"))
    assert conf["model"]["sdf_network"].to_dict() == \
        ref["model"]["sdf_network"].to_dict()
    assert conf["model"]["depth_extract_network"].to_dict() == \
        ref["model"]["depth_extract_network"].to_dict()
    assert conf["model"]["nerf"].to_dict() == ref["model"]["nerf"].to_dict()
