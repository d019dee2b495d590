from .boxes import (Boxes, box_area, box_iou, box_iou_async, masked_iou,
                    clip_to_image, remove_small_boxes_mask,
                    flip_boxes_horizontal, resize_boxes,
                    encode_boxes, decode_boxes, TO_REMOVE)
from .masks import (Masks, PolygonMasks, PolygonInstance, BinaryMasks,
                    rasterize_polygons, FLIP_LEFT_RIGHT, FLIP_TOP_BOTTOM)
from .keypoints import (Keypoints, PersonKeypoints, Click,
                        keypoints_to_heatmap)

__all__ = [
    "Boxes", "box_area", "box_iou", "box_iou_async", "masked_iou",
    "clip_to_image", "remove_small_boxes_mask", "flip_boxes_horizontal",
    "resize_boxes", "encode_boxes", "decode_boxes", "TO_REMOVE",
    "Masks", "PolygonMasks", "PolygonInstance", "BinaryMasks",
    "rasterize_polygons", "FLIP_LEFT_RIGHT", "FLIP_TOP_BOTTOM",
    "Keypoints", "PersonKeypoints", "Click", "keypoints_to_heatmap",
]
