# Import submodules explicitly (pipeline.renderer, ...).
