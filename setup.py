"""Packaging (reference setup.py:1-13, package `fourier` v0.1)."""

from setuptools import find_packages, setup

setup(
    name="fourier-tpu",
    version="0.1.0",
    description="TPU-native distributed KZG commitment framework (Pianist/PIANO)",
    packages=find_packages(include=["fourier_tpu", "fourier_tpu.*"]),
    python_requires=">=3.10",
    install_requires=["jax", "numpy", "requests"],
    entry_points={
        "console_scripts": ["fourier-tpu=fourier_tpu.runtime.cli:main"],
    },
)
