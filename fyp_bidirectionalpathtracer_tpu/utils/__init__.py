# Import submodules explicitly (utils.config, utils.image, ...).
