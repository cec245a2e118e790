from . import vecmath, rng, samplers  # noqa: F401
