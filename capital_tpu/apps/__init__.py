"""Applications built on the factorization engine (the serving role named in
BASELINE.json's north star: ALS-style normal-equation Cholesky solves for
candidate-retrieval model fitting; CholeskyQR2 for embedding
orthogonalization)."""
