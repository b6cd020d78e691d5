"""Package setup (reference analogue: setup.py installing
``uda_aerial_segmentation``, reference setup.py:4-16)."""

from setuptools import find_packages, setup

setup(
    name="uda_aerial_semantic_segmentation_research_tpu",
    version="0.1.0",
    description=("TPU-native JAX/XLA/Pallas framework for unsupervised "
                 "domain adaptation in aerial semantic segmentation"),
    packages=find_packages(exclude=("tests",)),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "numpy",
        "opencv-python",
        "tensorboard",
    ],
    extras_require={
        "viz": ["matplotlib", "seaborn", "pandas", "scikit-learn", "pillow"],
        "test": ["pytest", "torch"],
    },
)
