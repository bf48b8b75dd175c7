# benchmarks as an importable package (convergence.py reuses
# hermetic_fid.make_synthetic)
