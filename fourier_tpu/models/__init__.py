"""Protocol models: the PIANO bivariate KZG scheme."""
