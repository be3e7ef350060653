"""pyqmc_tpu: TPU-native real-space quantum Monte Carlo (JAX/XLA/Pallas).

Precision policy: QMC local energies involve ~1e-5 relative cancellations
(KE ~ +e2, EI ~ -e2 for core electrons). TPU matmuls default to bf16 inputs,
which measurably biases total energies (observed: +0.7 Ha on all-electron
H2O). We therefore force full-f32 matmul passes package-wide; hot paths that
tolerate lower precision opt back down locally with explicit
jax.lax.Precision arguments.
"""

import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
