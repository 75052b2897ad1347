from . import adm, layers  # noqa: F401
