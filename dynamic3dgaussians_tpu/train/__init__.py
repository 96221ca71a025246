"""Training layer: losses, optimizer, densification, timestep driver."""
