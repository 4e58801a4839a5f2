"""DSP primitives: C/A codes, correlators, loop filters, discriminators, C/N0."""
