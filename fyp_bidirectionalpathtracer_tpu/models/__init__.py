from . import procedural, obj  # noqa: F401
