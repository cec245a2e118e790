# Import submodules explicitly (ops.brdf, ops.materials, ...).
