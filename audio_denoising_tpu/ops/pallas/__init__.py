"""Fused Pallas TPU kernels for the hot DSP path (populated incrementally).

North star (SURVEY §7 step 8): a fused frame→window→rfft→mel→log1p front-end
and the model cell as a single VMEM-resident kernel — the whole per-hop
pipeline touches HBM once in, once out.
"""
