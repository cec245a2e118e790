# Import submodules explicitly (passes.gbuffer, passes.bdpt, ...).
