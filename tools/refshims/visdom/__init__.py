"""visdom shim: the reference imports it but never uses it (SURVEY.md §2.4(10))."""


class Visdom:  # pragma: no cover
    def __init__(self, *a, **k):
        pass
