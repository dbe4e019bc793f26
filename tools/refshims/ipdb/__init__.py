"""ipdb shim: imported by the reference's util.py, unused in training."""

import pdb


def set_trace():  # pragma: no cover
    pdb.set_trace()
