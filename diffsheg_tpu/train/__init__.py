from diffsheg_tpu.train.step import TrainState, create_train_state, make_train_step
