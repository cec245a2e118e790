# Submodules import each other across packages (scene <-> accel); import them
# explicitly (e.g. `from ...scene import camera`) rather than eagerly here.
