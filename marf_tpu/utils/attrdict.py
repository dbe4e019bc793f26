"""Attribute-access dictionary (replacement for the reference's `easydict.EasyDict`).

The reference threads one global `edict` options object through every
constructor (reference options.py:38, model/planar.py:36). We keep the same
ergonomics for the config layer — plain dict with attribute access, recursive
on nested dicts — while the compiled compute path receives only frozen/static
values extracted from it (jit never sees an AttrDict).
"""

from __future__ import annotations


class AttrDict(dict):
    """dict subclass with attribute access; nested dicts are converted."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        if d is None:
            d = {}
        d = dict(d)
        d.update(kwargs)
        for k, v in d.items():
            self[k] = v

    @staticmethod
    def _convert(value):
        if isinstance(value, dict) and not isinstance(value, AttrDict):
            return AttrDict(value)
        if isinstance(value, (list, tuple)):
            return type(value)(AttrDict._convert(v) for v in value)
        return value

    def __setitem__(self, key, value):
        super().__setitem__(key, AttrDict._convert(value))

    def __setattr__(self, name, value):
        self[name] = value

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as exc:
            raise AttributeError(name) from exc

    def __delattr__(self, name):
        try:
            del self[name]
        except KeyError as exc:
            raise AttributeError(name) from exc

    def copy(self) -> "AttrDict":
        return AttrDict({k: (v.copy() if isinstance(v, AttrDict) else v) for k, v in self.items()})


def to_plain_dict(d):
    """Recursively convert AttrDicts (and nested dicts) to plain dicts.

    Equivalent of the reference's `util.to_dict` (reference util.py:97-103),
    used when snapshotting the options file.
    """
    if isinstance(d, dict):
        return {k: to_plain_dict(v) for k, v in d.items()}
    if isinstance(d, (list, tuple)):
        return [to_plain_dict(v) for v in d]
    return d
