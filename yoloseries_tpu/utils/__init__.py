from .meters import AverageMeter, MeterBuffer
