"""Bilingual taxonomy-tree fixture (FIXTURES.md §4 shape, depth 3-4)."""

TREE = {
    "id": "root",
    "en": "Consultation",
    "zh": "咨询",
    "children": [
        {
            "id": "health",
            "en": "Health",
            "zh": "健康",
            "children": [
                {"id": "diet", "en": "Diet", "zh": "饮食", "children": []},
                {
                    "id": "exercise",
                    "en": "Exercise",
                    "zh": "运动",
                    "children": [
                        {"id": "cardio", "en": "Cardio", "zh": "有氧", "children": []},
                        {"id": "strength", "en": "Strength", "zh": "力量", "children": []},
                    ],
                },
            ],
        },
        {
            "id": "finance",
            "en": "Finance",
            "zh": "金融",
            "children": [
                {"id": "tax", "en": "Tax", "zh": "税务", "children": []},
            ],
        },
    ],
}

EXPECTED_PATH_IDS = {
    "root→health→diet",
    "root→health→exercise→cardio",
    "root→health→exercise→strength",
    "root→finance→tax",
}
