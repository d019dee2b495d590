from .boxes import (Boxes, box_area, box_iou, box_iou_async, masked_iou,
                    clip_to_image, remove_small_boxes_mask,
                    flip_boxes_horizontal, resize_boxes,
                    encode_boxes, decode_boxes, TO_REMOVE)

__all__ = [
    "Boxes", "box_area", "box_iou", "box_iou_async", "masked_iou",
    "clip_to_image", "remove_small_boxes_mask", "flip_boxes_horizontal",
    "resize_boxes", "encode_boxes", "decode_boxes", "TO_REMOVE",
]
