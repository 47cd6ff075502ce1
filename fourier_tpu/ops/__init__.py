"""TPU compute kernels: limb field arithmetic, NTT, curve ops, MSM."""
