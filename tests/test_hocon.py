import textwrap

import pytest

from vdnerf_tpu.utils.hocon import load_conf, parse_string

SAMPLE = textwrap.dedent(
    """
    general {
        base_exp_dir = ./exp/CASE_NAME/womsk_white
        recording = [
            ./dpt_runner.py,
            ./dpt_models,
        ]
    }

    dataset {
        data_dir = ./depth_data/CASE_NAME
        img_dir = IMG_DIR
        depth_dir = 00
    }

    train {
        learning_rate = 5e-4
        learning_rate_alpha = 0.05
        end_iter = 300000
        use_white_bkgd = True
        igr_weight = 0.1
        use_mask = False
    }

    model {
        nerf {
            D = 8,
            d_in = 4,
            multires = 10,
            skips = [4],
            use_viewdirs = True,
        }
        neus_renderer {
            n_samples = 64
            up_sample_steps = 4     # 1 for simple coarse-to-fine sampling
            perturb = 1.0
        }
    }
    """
)


def test_nested_and_scalars():
    conf = parse_string(SAMPLE)
    assert conf.get_string("general.base_exp_dir") == "./exp/CASE_NAME/womsk_white"
    assert conf.get_float("train.learning_rate") == pytest.approx(5e-4)
    assert conf.get_int("train.end_iter") == 300000
    assert conf.get_bool("train.use_white_bkgd") is True
    assert conf.get_bool("train.use_mask") is False
    assert conf.get_float("model.neus_renderer.perturb") == 1.0


def test_lists_and_comments():
    conf = parse_string(SAMPLE)
    assert conf["general.recording"] == ["./dpt_runner.py", "./dpt_models"]
    assert conf["model.nerf.skips"] == [4]
    # inline comment stripped
    assert conf.get_int("model.neus_renderer.up_sample_steps") == 4


def test_trailing_commas_and_splat():
    conf = parse_string(SAMPLE)
    nerf = conf["model.nerf"]
    kwargs = dict(**nerf)
    assert kwargs["D"] == 8 and kwargs["use_viewdirs"] is True


def test_defaults():
    conf = parse_string(SAMPLE)
    assert conf.get_int("train.warm_up_end", default=0) == 0
    assert conf.get_bool("train.focal_learnable", default=False) is False
    with pytest.raises(KeyError):
        conf.get_int("train.missing_key")


def test_template_substitution(tmp_path):
    p = tmp_path / "c.conf"
    p.write_text(SAMPLE)
    conf = load_conf(str(p), case="boat", img_dir="image")
    assert conf.get_string("general.base_exp_dir") == "./exp/boat/womsk_white"
    assert conf.get_string("dataset.img_dir") == "image"


def test_depth_dir_string():
    # `00` must stay usable as a path component, not collapse to int 0
    conf = parse_string(SAMPLE)
    assert conf.get_string("dataset.depth_dir") == "00"
