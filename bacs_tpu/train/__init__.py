"""Training layer: state pytree, optimizers/schedules, step factories, loop."""
