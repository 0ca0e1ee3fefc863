from gespmm_tpu.train.loop import TrainState, make_train_step, train_node_classifier

__all__ = ["TrainState", "make_train_step", "train_node_classifier"]
