from .trainer import Trainer, InterruptHandler
