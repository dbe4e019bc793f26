"""Config system tests: CLI DSL, YAML inheritance, overrides, snapshots."""

import os
import textwrap

import pytest

from marf_tpu.utils.attrdict import AttrDict, to_plain_dict
from marf_tpu.utils.config import (
    load_options,
    override_options,
    parse_arguments,
    resolve_yaml_path,
)


def test_parse_dsl_forms():
    opt = parse_arguments([
        "--a.b.c=3",
        "--flag",
        "--neg!",
        "--empty=",
        "--lst=[0,0.4]",
        "--s=hello",
        "--f=1.e-3",
    ])
    assert opt.a.b.c == 3
    assert opt.flag is True
    assert opt.neg is False
    assert opt.empty is None
    assert opt.lst == [0, 0.4]
    assert opt.s == "hello"
    assert opt.f == 1e-3


def test_parse_rejects_bad_args():
    with pytest.raises(AssertionError):
        parse_arguments(["notdashed=1"])
    with pytest.raises(AssertionError):
        parse_arguments(["--a=1", "--a=2"])  # duplicate key


def test_attrdict_nested():
    d = AttrDict({"a": {"b": 1}})
    assert d.a.b == 1
    d.a.c = {"x": 2}
    assert d.a.c.x == 2
    assert to_plain_dict(d) == {"a": {"b": 1, "c": {"x": 2}}}


def test_override_merges_nested():
    base = AttrDict({"optim": {"lr": 1e-3, "algo": "Adam"}})
    over = AttrDict({"optim": {"lr": 5e-4}})
    out = override_options(base, over)
    assert out.optim.lr == 5e-4
    assert out.optim.algo == "Adam"


def test_override_unknown_key_noninteractive(capsys):
    base = AttrDict({"a": 1})
    out = override_options(base, AttrDict({"b": 2}), safe_check=True, interactive=False)
    assert out.b == 2


def test_yaml_parent_inheritance(tmp_path):
    parent = tmp_path / "base.yaml"
    parent.write_text(textwrap.dedent("""
        a: 1
        nested:
            x: 10
            y: 20
    """))
    child = tmp_path / "child.yaml"
    child.write_text(textwrap.dedent(f"""
        _parent_: {parent}
        nested:
            y: 99
        b: 2
    """))
    opt = load_options(str(child))
    assert opt.a == 1
    assert opt.b == 2
    assert opt.nested.x == 10
    assert opt.nested.y == 99


def test_packaged_planar_yaml_resolves():
    path = resolve_yaml_path("planar")
    assert os.path.isfile(path)
    opt = load_options(path)
    assert opt.H == 360 and opt.W == 480
    assert opt.arch.layers == [None, 256, 256, 256, 256, 3]
    assert opt.warp.type == "homography" and opt.warp.dof == 8
    assert opt.loss_weight.render == 0
    assert opt.freq.scalar == 20 and opt.freq.vis == 100


def test_planar_config_from_options():
    from marf_tpu.models.planar import PlanarConfig

    opt = load_options(resolve_yaml_path("planar"))
    opt.barf_c2f = [0, 0.4]
    cfg = PlanarConfig.from_options(opt)
    assert cfg.arch.barf_c2f == (0, 0.4)
    assert cfg.arch.posenc_L == 8
    assert cfg.arch.input_dim == 34
    assert cfg.map_hw == (180, 240)
    assert cfg.loss_weight == {"render": 0, "rgb": 0, "edge": 0, "mask": 0}
    # posenc ablation: --arch.posenc!
    opt2 = load_options(resolve_yaml_path("planar"))
    opt2.arch.posenc = False
    cfg2 = PlanarConfig.from_options(opt2)
    assert cfg2.arch.posenc_L is None
    assert cfg2.arch.input_dim == 2


def test_fused_streams_auto_resolution(monkeypatch):
    """tpu.fused_streams=0 resolves to 2 ONLY for the single-chip TPU dedup
    pipeline (measured +1.0% round 5, PERF.md); everything else keeps 0
    (= the env default). The test mocks the backend/validation gates the
    resolution consults (models/planar.from_options)."""
    from marf_tpu.models import planar as pm

    def implicit_opt():
        opt = load_options(resolve_yaml_path("planar"))
        opt.barf_c2f = [0, 0.4]
        opt.use_masks = False
        opt.use_implicit_mask = True
        return opt

    # CPU/test backend: stays 0 (dedup default only fires on real TPU)
    assert pm.PlanarConfig.from_options(implicit_opt()).arch.fused_streams == 0

    monkeypatch.setattr(pm.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(pm.jax, "devices", lambda: [object()])
    monkeypatch.setattr(pm, "dedup_hw_validated", lambda: True)
    assert pm.PlanarConfig.from_options(implicit_opt()).arch.fused_streams == 2

    # per-image heads admit no dedup -> env default
    opt = implicit_opt()
    opt.build_single_masks = True
    assert pm.PlanarConfig.from_options(opt).arch.fused_streams == 0
    # fixed-mask canonical config -> env default
    opt = load_options(resolve_yaml_path("planar"))
    opt.barf_c2f = [0, 0.4]
    assert pm.PlanarConfig.from_options(opt).arch.fused_streams == 0
    # explicit pin wins over the auto default
    opt = implicit_opt()
    opt.tpu.fused_streams = 1
    assert pm.PlanarConfig.from_options(opt).arch.fused_streams == 1
    # multi-chip: mesh path keeps the env default (sharded dedup inputs pad
    # the column axis without a stream-count input)
    monkeypatch.setattr(pm.jax, "devices", lambda: [object(), object()])
    assert pm.PlanarConfig.from_options(implicit_opt()).arch.fused_streams == 0
