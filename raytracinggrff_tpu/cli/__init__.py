"""CLI entry points (compilation-cache defaults live in the package
__init__, which runs before any jax-importing submodule)."""
