"""Annotation preprocessing: annotator JSON → slices / generalised JSON / labels.

Rebuild of the reference's ``utils/annotations/preprocess.py:1-437``:

1. ``generate_slices``    — USE ranges → ``<video>.txt`` slice files (:23-65);
2. ``generalise_jsons``   — map player names → Near/Far and Forehand/Backhand →
   Left/Right using score-derived end-change counting incl. tiebreaks (:109-312);
3. ``generate_labels``    — per-frame class label files over the USE range (:315-410).

The court-position logic (who is at the near end, given set/game/point score) is
factored into :func:`player_position` / :func:`stroke_side` — the reference inlines
the same parity table four times (:198-209, :252-304).

Documented deviation: the reference's "closest point" fallback for a serve/hit that
overlaps no point compares against an never-updated sentinel
(preprocess.py:166-172), which silently resolves to the *last* point. Here the
fallback picks the genuinely nearest point by frame distance and logs a warning.
"""
from __future__ import annotations

import json
import logging
import os

MAX_SETS = 5
# [RIGHT, LEFT]-handed players (reference preprocess.py:19-20)
HANDER = [
    ["Federer", "Williams", "Sharapova", "Djokovic", "Tsonga", "Zvonareva",
     "Del Potro", "Azarenka"],
    ["Nadal"],
]


def generate_slices(annotations_dir, slices_dir, videos):
    for video in videos:
        path = os.path.join(annotations_dir, video + ".json")
        with open(path, "r") as f:
            database = json.load(f)
        if "classes" not in database or "USE" not in database["classes"]:
            raise ValueError(f"{path} lacks 'classes'/'USE'; cannot extract slices")
        os.makedirs(slices_dir, exist_ok=True)
        with open(os.path.join(slices_dir, video + ".txt"), "w") as f:
            for s in database["classes"]["USE"]:
                f.write(f"{int(s['start'])} {int(s['end'])}\n")
    return 1


def generate_points_list(database):
    """[[set_score, game_score, point_score, start, end, name], ...]
    (reference preprocess.py:68-106)."""
    points = []
    for point in database["classes"]["Point"]:
        start, end = int(point["start"]), int(point["end"])
        set_score = ""
        for set_ in database["classes"]["Set"]:
            if int(set_["start"]) <= start <= int(set_["end"]) or \
                    int(set_["start"]) <= end <= int(set_["end"]):
                set_score = str(set_["custom"]["Score"])
        game_score = ""
        for game in database["classes"]["Game"]:
            if int(game["start"]) <= start <= int(game["end"]) or \
                    int(game["start"]) <= end <= int(game["end"]):
                game_score = str(game["custom"]["Score"])
        points.append([set_score, game_score, str(point["custom"]["Score"]),
                       start, end, point["name"]])
    return points


def count_end_swaps(set_score: str, game_score: str, point_score: str) -> int:
    """End changes since the start of the set: one per two games, plus one per six
    points inside a tiebreak (reference preprocess.py:186-196)."""
    set_split = [int(x) for x in set_score.split("-")]
    game_split = [int(x) for x in game_score.split("-")]
    swaps = sum(game_split) // 2
    if sum(set_split) < MAX_SETS and sum(game_split) == 13:  # tiebreak game
        point_split = point_score.split("-")
        if len(point_split) > 1:  # a numeric score, not 'Game'
            # int(x/6) truncates TOWARD ZERO like the reference
            # (preprocess.py:196): at point score 0-0 the numerator is -1 and
            # must contribute 0 swaps, not floor-division's -1
            swaps += int((sum(int(x) for x in point_split) - 1) / 6)
    return swaps


def player_position(player: str, near_player: str, swaps: int) -> str:
    """'Near'/'Far' for ``player`` given the set's starting near player and the
    number of end changes (parity table at reference preprocess.py:198-209)."""
    started_near = player == near_player
    same_as_start = swaps % 2 == 0
    return "Near" if started_near == same_as_start else "Far"


def stroke_side(player: str, position: str, stroke: str) -> str:
    """Forehand/Backhand → camera-frame Left/Right, given handedness and court end
    (reference preprocess.py:256-304). Unknown players default to right-handed."""
    right_handed = player not in HANDER[1]
    # a right-hander's forehand points Right when near, Left when far
    forehand_right = right_handed == (position == "Near")
    if stroke == "Forehand":
        return "Right" if forehand_right else "Left"
    if stroke == "Backhand":
        return "Left" if forehand_right else "Right"
    return stroke


def _find_point(points, start: int, end: int, context: str):
    middle = start + (end - start) / 2
    for point in points:
        if point[3] <= middle <= point[4]:
            return point
    if not points:
        # keep the reference's diagnostic (preprocess.py:176) instead of an
        # opaque min()-of-empty-sequence ValueError mid-write
        raise ValueError(
            f"Error in annotation file {context}: no Point events exist — "
            "ensure all serve and hit events have some overlap with a point "
            "event")
    nearest = min(
        points, key=lambda p: min(abs(p[3] - end), abs(start - p[4]))
    )
    logging.warning(
        "%s event [%d, %d] overlaps no point; using nearest point %s",
        context, start, end, nearest[5],
    )
    return nearest


def generalise_jsons(annotations_dir, generalised_dir, videos):
    for video in videos:
        path = os.path.join(annotations_dir, video + ".json")
        with open(path, "r") as f:
            database = json.load(f)

        sets = {s["start"]: s["custom"]["Near"]
                for s in database["classes"]["Set"]}
        near = [sets[k] for k in sorted(sets)]

        points = generate_points_list(database)

        players = {g["custom"]["Winner"] for g in database["classes"]["Game"]}
        assert len(players) == 2, f"expected 2 players, got {players}"

        for event in database["classes"]["Serve"] + database["classes"]["Hit"]:
            start, end = int(event["start"]), int(event["end"])
            point = _find_point(points, start, end, video)
            swaps = count_end_swaps(point[0], point[1], point[2])
            set_idx = sum(int(x) for x in point[0].split("-")) - 1
            player = event["custom"]["Player"]
            assert player in players, f"{player!r} not one of {players}"
            position = player_position(player, near[set_idx], swaps)
            if "Side" in event["custom"]:  # hits carry a stroke side
                event["custom"]["Side"] = stroke_side(
                    player, position, event["custom"]["Side"]
                )
            event["custom"]["Player"] = position

        os.makedirs(generalised_dir, exist_ok=True)
        with open(os.path.join(generalised_dir, video + ".json"), "w") as f:
            json.dump(database, f)
    return 1


# (position, detail) → class label (reference preprocess.py:352-392)
_HIT_LABEL = {("Far", "Right"): "HFR", ("Far", "Left"): "HFL",
              ("Near", "Right"): "HNR", ("Near", "Left"): "HNL"}
_SERVE_LABEL = {("Far", "In"): "SFI", ("Far", "Fault"): "SFF",
                ("Far", "Let"): "SFL", ("Near", "In"): "SNI",
                ("Near", "Fault"): "SNF", ("Near", "Let"): "SNL"}


def generate_labels(generalised_dir, labels_dir, videos, classes=None):
    if classes is None:
        from tennis_tpu.data.tennis_set import DEFAULT_CLASSES

        classes = list(DEFAULT_CLASSES)

    for video in videos:
        with open(os.path.join(generalised_dir, video + ".json"), "r") as f:
            database = json.load(f)

        # serves first, hits second: on overlap the hit label wins, matching the
        # reference's classes.names iteration order (serve classes precede hit
        # classes, and later classes overwrite; preprocess.py:398-402)
        label_of = {}
        for serve in database["classes"]["Serve"]:
            key = (serve["custom"]["Player"], serve["custom"]["Result"])
            if key not in _SERVE_LABEL:
                raise ValueError(f"bad serve annotation {key} in {video}")
            for frame in range(int(serve["start"]), int(serve["end"])):
                label_of[frame] = _SERVE_LABEL[key]
        for hit in database["classes"]["Hit"]:
            key = (hit["custom"]["Player"], hit["custom"]["Side"])
            if key not in _HIT_LABEL:
                raise ValueError(f"bad hit annotation {key} in {video}")
            for frame in range(int(hit["start"]), int(hit["end"])):
                label_of[frame] = _HIT_LABEL[key]

        use = database["classes"]["USE"][0]
        os.makedirs(labels_dir, exist_ok=True)
        with open(os.path.join(labels_dir, video + ".txt"), "w") as f:
            for frame in range(int(use["start"]), int(use["end"])):
                f.write(f"{frame}\t{label_of.get(frame, 'OTH')}\n")


def preprocess(annotations_dir="data/annotations",
               generalised_dir="data/annotations/generalised",
               slices_dir="data/annotations/slices",
               labels_dir="data/annotations/labels",
               videos=("V006", "V007", "V008", "V009", "V010")):
    """The full pipeline (reference preprocess.py:413-417)."""
    generate_slices(annotations_dir, slices_dir, videos)
    generalise_jsons(annotations_dir, generalised_dir, videos)
    generate_labels(generalised_dir, labels_dir, videos)
