"""Physics component operators: pure, batched, vmappable functions.

Each module mirrors one component abstraction of the reference
(/root/reference/PyFlyt/core/abstractions/) re-expressed as
``(state, params, inputs) -> (state, outputs)`` pure functions over pytrees.
"""
