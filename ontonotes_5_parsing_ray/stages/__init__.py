"""Ray Data batch transforms: stateless `map_batches` tasks and actor pools."""
