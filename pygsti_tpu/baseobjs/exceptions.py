"""Framework warning/exception categories (reference:
pygsti/baseobjs/exceptions.py -- the reference promotes its own warning
classes to errors in tests)."""


class PyGSTiWarning(UserWarning):
    """Base warning category for the framework."""


class PyGSTiDeprecationWarning(PyGSTiWarning, DeprecationWarning):
    """Deprecated-API usage."""


class NumericalDomainWarning(PyGSTiWarning):
    """A numerical result may be unreliable (e.g. non-TP model in an
    analysis assuming TP)."""


class PyGSTiError(Exception):
    """Base exception for framework errors."""
