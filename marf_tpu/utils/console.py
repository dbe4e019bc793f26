"""Console logging + timing utilities.

Same observable surface as the reference's `util.py`: a `log` singleton with
`process/title/info/options` (reference util.py:44-67), an EMA iteration timer
(reference util.py:69-79), and small helpers (`get_layer_dims` util.py:105-108,
`colorcode_to_number` util.py:110-115). Re-written for this framework; the
timer additionally reports steps/sec since that is the headline benchmark.
"""

from __future__ import annotations

import time

try:
    import termcolor

    def _colored(message, color, attrs):
        return termcolor.colored(str(message), color=color, attrs=attrs)
except ImportError:  # pragma: no cover - termcolor is expected in the image

    def _colored(message, color, attrs):  # pylint: disable=unused-argument
        return str(message)


def _attrs(kwargs):
    return [k for k, v in kwargs.items() if v is True]


def green(message, **kwargs):
    return _colored(message, "green", _attrs(kwargs))


def cyan(message, **kwargs):
    return _colored(message, "cyan", _attrs(kwargs))


def yellow(message, **kwargs):
    return _colored(message, "yellow", _attrs(kwargs))


def magenta(message, **kwargs):
    return _colored(message, "magenta", _attrs(kwargs))


def grey(message, **kwargs):
    return _colored(message, "grey", _attrs(kwargs))


class Log:
    """Console logger singleton (same call surface as reference util.py:44-67)."""

    def process(self, pid):
        print(grey(f"Process ID: {pid}", bold=True))

    def title(self, message):
        print(yellow(message, bold=True, underline=True))

    def info(self, message):
        print(magenta(message, bold=True))

    def warn(self, message):
        print(yellow(f"WARNING: {message}", bold=True))

    def options(self, opt, level=0):
        for key, value in sorted(opt.items()):
            if isinstance(value, dict):
                print("   " * level + cyan("* ") + green(key) + ":")
                self.options(value, level + 1)
            else:
                print("   " * level + cyan("* ") + green(key) + ":", yellow(value))


log = Log()


class IterTimer:
    """EMA iteration timer (reference util.py:69-79, momentum 0.99) extended
    with a steps/sec readout. Chunked stepping is supported by passing
    `n_steps` so the per-step mean stays comparable to the reference's."""

    def __init__(self, momentum: float = 0.99):
        self.momentum = momentum
        self.start = time.time()
        self.it_mean = None
        self._t0 = None

    def tic(self):
        self._t0 = time.time()

    def toc(self, n_steps: int = 1) -> float:
        dt = (time.time() - self._t0) / max(n_steps, 1)
        if self.it_mean is None:
            self.it_mean = dt
        else:
            self.it_mean = self.it_mean * self.momentum + dt * (1 - self.momentum)
        return dt

    @property
    def elapsed(self) -> float:
        return time.time() - self.start

    @property
    def steps_per_sec(self) -> float:
        if not self.it_mean:
            return 0.0
        return 1.0 / self.it_mean

    def eta(self, steps_left: int) -> float:
        return (self.it_mean or 0.0) * steps_left


def get_layer_dims(layers):
    """[d0, d1, ..., dn] -> [(d0,d1), (d1,d2), ...] (reference util.py:105-108)."""
    return list(zip(layers[:-1], layers[1:]))


def colorcode_to_number(code: str):
    """'#RRGGBB' hex color -> (r, g, b) ints (reference util.py:110-115)."""
    code = code.lstrip("#")
    return tuple(int(code[i : i + 2], 16) for i in (0, 2, 4))
