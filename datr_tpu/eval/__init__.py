from .coco_eval import CocoEvaluator
