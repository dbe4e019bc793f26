"""Config / flag system.

Reproduces the reference's public CLI contract (reference options.py):

  --key1.key2=value   -> yaml-parsed value        (options.py:29-37)
  --key1.key2=        -> None
  --key1.key2         -> True
  --key1.key2!        -> False

YAML base files support recursive `_parent_` inheritance (options.py:63-71);
CLI overrides are merged on top with an unknown-key guard (options.py:86-94).
Unlike the reference, the guard is non-interactive-safe: pass
`interactive=False` (or set MARF_YES=1) to auto-accept new keys — required
for CI and for the sweep runner.

`process_options` seeds RNGs, derives the run name suffix (`_seed{n}` or a
random 4-letter ID), and the output path (options.py:99-120). Device
selection is JAX-native: `opt.device` records the platform of
`jax.devices()[0]` (cpu flag forces CPU); there is no per-process GPU index —
placement is XLA's job.
"""

from __future__ import annotations

import os
import random
import string
import sys

import numpy as np
import yaml

from marf_tpu.utils.attrdict import AttrDict, to_plain_dict
from marf_tpu.utils.console import log

# Search order for `--yaml=<name>` -> first existing of these (keeps the
# reference's `options/<name>.yaml` layout working as a drop-in, falling back
# to the configs packaged with marf_tpu).
_PACKAGE_CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


def parse_arguments(args):
    """Parse `--a.b.c=value` style CLI arguments into a nested AttrDict
    (same DSL as reference options.py:14-39)."""
    opt_cmd = {}
    for arg in args:
        assert arg.startswith("--"), f"argument must start with '--': {arg}"
        if "=" not in arg[2:]:
            key_str, value = (arg[2:-1], "false") if arg[-1] == "!" else (arg[2:], "true")
        else:
            key_str, value = arg[2:].split("=", 1)
        keys_sub = key_str.split(".")
        opt_sub = opt_cmd
        for k in keys_sub[:-1]:
            if k not in opt_sub:
                opt_sub[k] = {}
            opt_sub = opt_sub[k]
        assert keys_sub[-1] not in opt_sub, f"duplicate key: {keys_sub[-1]}"
        opt_sub[keys_sub[-1]] = yaml.safe_load(value)
    return AttrDict(opt_cmd)


def resolve_yaml_path(name_or_path: str) -> str:
    """Resolve a `--yaml=` value to a file path."""
    candidates = [
        name_or_path,
        f"options/{name_or_path}.yaml",
        os.path.join(_PACKAGE_CONFIG_DIR, f"{name_or_path}.yaml"),
    ]
    for cand in candidates:
        if os.path.isfile(cand):
            return cand
    raise FileNotFoundError(f"config yaml not found; tried {candidates}")


def load_options(fname: str) -> AttrDict:
    """Load a YAML options file, recursively resolving `_parent_` bases
    (reference options.py:59-73). Parent paths are resolved relative to the
    child file's directory, then the CWD, then the packaged configs."""
    with open(fname, encoding="utf-8") as file:
        opt = AttrDict(yaml.safe_load(file) or {})
    if "_parent_" in opt:
        parent_fnames = opt.pop("_parent_")
        if isinstance(parent_fnames, str):
            parent_fnames = [parent_fnames]
        for parent_fname in parent_fnames:
            for cand in (
                os.path.join(os.path.dirname(os.path.abspath(fname)), parent_fname),
                parent_fname,
                os.path.join(_PACKAGE_CONFIG_DIR, os.path.basename(parent_fname)),
            ):
                if os.path.isfile(cand):
                    parent_fname = cand
                    break
            opt_parent = load_options(parent_fname)
            opt_parent = override_options(opt_parent, opt, key_stack=[])
            opt = opt_parent
    return opt


def override_options(opt, opt_over, key_stack=None, safe_check=False, interactive=None):
    """Merge `opt_over` into `opt` (reference options.py:76-96). With
    `safe_check`, unknown keys require confirmation; non-interactive runs
    (interactive=False or MARF_YES=1 or no tty) auto-accept."""
    if key_stack is None:
        key_stack = []
    if interactive is None:
        interactive = os.environ.get("MARF_YES", "") not in ("1", "true") and sys.stdin.isatty()
    for key, value in opt_over.items():
        if isinstance(value, dict):
            opt[key] = override_options(
                opt.get(key, AttrDict()),
                value,
                key_stack=key_stack + [key],
                safe_check=safe_check,
                interactive=interactive,
            )
        else:
            if safe_check and key not in opt:
                key_str = ".".join(key_stack + [key])
                if interactive:
                    add_new = None
                    while add_new not in ("y", "n"):
                        add_new = input(f'"{key_str}" not found in original opt, add? (y/n) ')
                    if add_new == "n":
                        print("safe exiting...")
                        sys.exit(0)
                else:
                    log.warn(f'adding new config key "{key_str}" (non-interactive auto-accept)')
            opt[key] = value
    return opt


def set_opt(opt_cmd=None, interactive=None) -> AttrDict:
    """Build the final options object from CLI overrides (reference options.py:42-56)."""
    if opt_cmd is None:
        opt_cmd = AttrDict()
    log.info("setting configurations...")
    assert "model" in opt_cmd, "--model must be specified"
    assert "yaml" in opt_cmd, "--yaml must be specified"
    fname = resolve_yaml_path(str(opt_cmd.yaml))
    opt_base = load_options(fname)
    opt = override_options(opt_base, opt_cmd, key_stack=[], safe_check=True, interactive=interactive)
    process_options(opt)
    log.options(opt)
    return opt


def process_options(opt: AttrDict) -> None:
    """Derive run name / output path / device and seed RNGs
    (reference options.py:99-120, JAX-native device handling)."""
    if opt.get("seed") is not None:
        random.seed(opt.seed)
        np.random.seed(opt.seed)
        if opt.seed != 0:
            opt.name = f"{opt.name}_seed{opt.seed}"
    else:
        randkey = "".join(random.choice(string.ascii_uppercase) for _ in range(4))
        opt.name = f"{opt.name}_{randkey}"
    opt.output_path = f"{opt.output_root}/{opt.group}/{opt.name}"
    os.makedirs(opt.output_path, exist_ok=True)
    import jax  # local import: keep config importable without initializing backends

    if opt.get("cpu"):
        # actually force the CPU backend (the runtime image pre-imports jax
        # with a TPU plugin, so the env var is too late — see tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
        opt.device = "cpu"
    else:
        opt.device = jax.devices()[0].platform


def save_options_file(opt: AttrDict, interactive=None) -> None:
    """Snapshot the options to `<output_path>/options.yaml`, diffing against a
    pre-existing snapshot (reference options.py:123-150). Non-interactive runs
    print the diff and override."""
    if interactive is None:
        interactive = os.environ.get("MARF_YES", "") not in ("1", "true") and sys.stdin.isatty()
    opt_fname = f"{opt.output_path}/options.yaml"
    if os.path.isfile(opt_fname):
        with open(opt_fname, encoding="utf-8") as file:
            opt_old = yaml.safe_load(file)
        if to_plain_dict(opt) != opt_old:
            print("existing options file found (different from current one)...")
            _print_options_diff(opt_old, to_plain_dict(opt))
            if interactive:
                override = None
                while override not in ("y", "n"):
                    override = input("override? (y/n) ")
                if override == "n":
                    print("safe exiting...")
                    sys.exit(0)
            else:
                log.warn("overriding existing options file (non-interactive)")
        else:
            print("existing options file found (identical)")
    else:
        print("(creating new options file...)")
    with open(opt_fname, "w", encoding="utf-8") as file:
        yaml.safe_dump(to_plain_dict(opt), file, default_flow_style=False, indent=4)


def _print_options_diff(old, new, prefix=""):
    """In-process recursive diff (replaces the reference shelling out to `diff`,
    options.py:136)."""
    keys = sorted(set(old or {}) | set(new or {}))
    for key in keys:
        vo = (old or {}).get(key, "<absent>")
        vn = (new or {}).get(key, "<absent>")
        if isinstance(vo, dict) or isinstance(vn, dict):
            _print_options_diff(
                vo if isinstance(vo, dict) else {},
                vn if isinstance(vn, dict) else {},
                prefix=f"{prefix}{key}.",
            )
        elif vo != vn:
            print(f"  {prefix}{key}: {vo} -> {vn}")
