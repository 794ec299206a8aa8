"""Config-surface tests: merge precedence, naming, opt.yml round-trip."""

import os

import pytest
import yaml

from latent2im_tpu.config.attributes import (
    build_attr_vocab,
    default_attr_path,
    parse_layers,
)
from latent2im_tpu.config.options import TrainOptions, VisOptions, experiment_name


def _parse(args, tmp_path, print_opt=True):
    return TrainOptions().parse(
        args + ["--models_dir", str(tmp_path), "--overwrite_config"],
        print_opt=print_opt,
    )


def test_experiment_naming(tmp_path):
    opt = _parse(
        ["--model", "stylegan_v2_real", "--transform", "face",
         "--walk_type", "linear", "--learning_rate", "0.0001", "--loss", "l2"],
        tmp_path,
    )
    # {model}_{transform}_{walk_type}_lr{lr}_{loss}_{latent}
    assert os.path.basename(opt.output_dir) == \
        "stylegan_v2_real_face_linear_lr0.0001_l2_w"


def test_prefix_suffix_name(tmp_path):
    opt = _parse(["--prefix", "P_", "--suffix", "_S"], tmp_path)
    base = os.path.basename(opt.output_dir)
    assert base.startswith("P_") and base.endswith("_S")
    opt2 = _parse(["--name", "custom"], tmp_path)
    assert os.path.basename(opt2.output_dir) == "custom"


def test_opt_yml_round_trip(tmp_path):
    opt = _parse(["--attrList", "Smiling", "--num_samples", "7"], tmp_path)
    yml = os.path.join(opt.output_dir, "opt.yml")
    assert os.path.isfile(yml)
    assert os.path.isfile(os.path.join(opt.output_dir, "opt.txt"))
    data = yaml.safe_load(open(yml))
    assert data["num_samples"] == 7
    assert data["attrList"] == "Smiling"
    assert data["stylegan"]["latent"] == "w"
    # the dump always disables overwrite for the round trip
    assert data["overwrite_config"] is False

    # VisOptions consumes the yml positionally -> (opt, conf)
    vopt, conf = VisOptions().parse([yml, "--noise_seed", "3"])
    assert vopt.noise_seed == 3
    assert conf.num_samples == 7
    assert conf.stylegan.latent == "w"


def test_overwrite_guard(tmp_path):
    _parse(["--name", "g1"], tmp_path)
    with pytest.raises(AssertionError, match="overwrite_config"):
        TrainOptions().parse(
            ["--name", "g1", "--models_dir", str(tmp_path)], print_opt=True
        )


def test_yaml_merge_precedence(tmp_path):
    # yaml value applies unless the flag is explicitly on the CLI
    opt1 = _parse(["--name", "m1", "--num_samples", "11"], tmp_path)
    yml = os.path.join(opt1.output_dir, "opt.yml")

    opt2 = TrainOptions().parse(
        ["--config_file", yml, "--name", "m2", "--models_dir", str(tmp_path),
         "--overwrite_config"],
        print_opt=False,
    )
    assert opt2.num_samples == 11  # from yaml
    opt3 = TrainOptions().parse(
        ["--config_file", yml, "--num_samples", "5", "--name", "m3",
         "--models_dir", str(tmp_path), "--overwrite_config"],
        print_opt=False,
    )
    assert opt3.num_samples == 5  # CLI overrides yaml


def test_attr_vocab():
    names, table = build_attr_vocab("face", default_attr_path("face"))
    assert "Smiling" in table
    sub, table2 = build_attr_vocab("face", default_attr_path("face"),
                                   attr_list="Smiling,Young")
    assert sub == ["Smiling", "Young"]
    with pytest.raises(KeyError):
        build_attr_vocab("face", default_attr_path("face"), attr_list="NotAnAttr")

    names, table = build_attr_vocab("xray")
    assert names[0] == "Cardiomegaly" and len(names) == 5
    names, table = build_attr_vocab("dsprites")
    assert names == ["scale", "x", "y", "posx", "posy"]
    names, table = build_attr_vocab("scene")
    assert "daylight" in table


def test_parse_layers():
    assert parse_layers(None) is None
    assert parse_layers("") is None
    assert parse_layers("0,1,5") == (0, 1, 5)
    assert parse_layers((2, 3)) == (2, 3)


def test_remat_g_flag_forms(tmp_path):
    """--remat_g is tri-state: absent -> False, bare flag -> 'all' (the
    pre-'block' boolean behavior, kept truthy for old scripts/yml), and an
    explicit mode selects the checkpoint granularity."""
    assert _parse([], tmp_path, print_opt=False).remat_g is False
    assert _parse(["--remat_g"], tmp_path, print_opt=False).remat_g == "all"
    assert _parse(["--remat_g", "block"], tmp_path,
                  print_opt=False).remat_g == "block"
    assert _parse([], tmp_path, print_opt=False).remat_towers is False
    assert _parse(["--remat_towers"], tmp_path,
                  print_opt=False).remat_towers is True
