# Import submodules explicitly (accel.bvh, accel.traverse); kept lazy to
# avoid scene<->accel import cycles.
