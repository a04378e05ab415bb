# Pallas TPU kernels. Imported lazily from ops dispatch so that pure-jnp
# paths work without touching Pallas (e.g. on CPU test runs).
