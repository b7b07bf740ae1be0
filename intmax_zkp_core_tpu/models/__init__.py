"""Application layer: trees, rollup circuits, accounts — the reference's
``src/{sparse_merkle_tree,merkle_tree,transaction,rollup,zkdsa,recursion}``
semantics rebuilt on the TPU engine."""
