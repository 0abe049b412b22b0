"""Command-line entry points — flag-compatible spellings of the reference drivers
(`describe_broad_neurons.py`, `lumi_single_gpu_train_classifier.py`, missing zs eval)."""
