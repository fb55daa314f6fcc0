"""Bundled offline sample data.

The reference pulls CNN/DailyMail, XSum, SAMSum, and MMLU from the HF hub at
runtime (/root/reference/src/datasets/loaders.py:39-64,222-290). This
environment has no network, so the loaders fall back to these bundled
synthetic samples (original text written for this repo) with the same record
shapes, keeping every harness runnable end-to-end offline.
"""

SUMMARIZATION_SAMPLES = {
    "cnn_dailymail": [
        (
            "The city council voted on Tuesday to approve a new bicycle lane "
            "network spanning forty kilometers of downtown streets. Supporters "
            "argued the plan would reduce traffic congestion and improve air "
            "quality, while opponents raised concerns about the loss of parking "
            "spaces. Construction is expected to begin in the spring and will be "
            "funded through a combination of municipal bonds and a federal "
            "transportation grant. The mayor called the vote a turning point for "
            "the city's transit strategy and promised quarterly progress reports.",
            "City council approves forty-kilometer bike lane network. "
            "Construction begins in spring, funded by bonds and a federal grant.",
        ),
        (
            "Researchers at the national observatory announced the discovery of "
            "a binary asteroid system passing within observation range of Earth. "
            "The pair, informally nicknamed Castor and Pollux, orbit each other "
            "every eleven hours. Scientists say the system poses no threat to the "
            "planet but offers a rare opportunity to study how such pairs form. "
            "Telescopes across three continents will track the objects for the "
            "next two weeks, and the data will be shared publicly.",
            "Astronomers discover a binary asteroid system orbiting every eleven "
            "hours. It poses no threat and will be tracked for two weeks.",
        ),
        (
            "A regional airline unveiled plans to convert half of its short-haul "
            "fleet to hybrid-electric aircraft by the end of the decade. The "
            "company signed a purchase agreement for thirty aircraft with an "
            "option for twenty more. Executives said rising fuel costs and new "
            "emissions rules drove the decision. Analysts noted that charging "
            "infrastructure at smaller airports remains a significant hurdle, "
            "though several hub airports have already begun upgrades.",
            "Regional airline to convert half its short-haul fleet to "
            "hybrid-electric planes, ordering thirty aircraft with options for "
            "twenty more.",
        ),
        (
            "The public library system reported a record year for digital "
            "lending, with e-book checkouts up sixty percent over the previous "
            "year. Librarians attribute the growth to expanded catalog licensing "
            "and a new mobile app. Physical visits also rose modestly, driven by "
            "community events and tutoring programs. The system plans to extend "
            "opening hours at six branches and hire additional staff to meet "
            "demand, pending budget approval from the county board.",
            "Library system sets digital lending record with e-book checkouts up "
            "sixty percent; plans longer hours and new staff.",
        ),
        (
            "Engineers completed the final span of the river crossing two months "
            "ahead of schedule, marking the largest infrastructure project in the "
            "county's history. The bridge replaces a ferry service that has "
            "operated for over a century. Local businesses expect a surge in "
            "weekend visitors once the crossing opens. A ribbon-cutting ceremony "
            "is planned for next month, and the ferry will make a final "
            "commemorative voyage the same day.",
            "River bridge finished two months early, replacing a century-old "
            "ferry; opening ceremony planned for next month.",
        ),
    ],
    "xsum": [
        (
            "Heavy overnight snowfall closed mountain passes across the region, "
            "stranding dozens of delivery vehicles. Road crews worked through the "
            "morning to clear the main routes, and officials said all passes "
            "should reopen by evening. No injuries were reported.",
            "Snow closes mountain passes; routes expected to reopen by evening.",
        ),
        (
            "The coastal town's annual kite festival drew its largest crowd in a "
            "decade, with organizers estimating twenty thousand visitors over the "
            "weekend. Local hotels reported full occupancy for the first time "
            "since the pandemic.",
            "Kite festival draws record crowd of twenty thousand visitors.",
        ),
        (
            "A software fault briefly grounded flights at the international "
            "airport on Friday morning. Airlines resumed departures within two "
            "hours, but delays rippled through the schedule into the afternoon.",
            "Software fault grounds flights for two hours, causing delays.",
        ),
    ],
    "samsum": [
        (
            "Amy: Are we still on for dinner tonight?\nBen: Yes! 7pm at the "
            "usual place?\nAmy: Perfect. Should I book a table?\nBen: Already "
            "done. See you there.\nAmy: Great, see you!",
            "Amy and Ben confirm dinner at 7pm; Ben has booked the table.",
        ),
        (
            "Chris: Did you send the report to the client?\nDana: Sending it in "
            "an hour, just fixing the charts.\nChris: OK. Copy me when you do.\n"
            "Dana: Will do.",
            "Dana will send the report in an hour after fixing charts and copy "
            "Chris.",
        ),
        (
            "Omar: The printer on floor two is jammed again.\nPriya: Third time "
            "this week. I'll file a ticket.\nOmar: Thanks. I'll use the one "
            "upstairs meanwhile.",
            "The floor-two printer is jammed again; Priya will file a ticket and "
            "Omar will print upstairs.",
        ),
    ],
}

MMLU_SAMPLES = [
    # (question, [choice A, B, C, D], answer_index)
    (
        "What is the derivative of x^2 with respect to x?",
        ["2x", "x", "x^2", "2"],
        0,
    ),
    (
        "Which gas makes up the largest fraction of Earth's atmosphere?",
        ["Oxygen", "Carbon dioxide", "Nitrogen", "Argon"],
        2,
    ),
    (
        "In computing, what does CPU stand for?",
        [
            "Central Processing Unit",
            "Computer Personal Unit",
            "Central Program Utility",
            "Core Processing Utility",
        ],
        0,
    ),
    (
        "Which planet is known as the Red Planet?",
        ["Venus", "Mars", "Jupiter", "Mercury"],
        1,
    ),
    (
        "What is the chemical symbol for gold?",
        ["Ag", "Gd", "Au", "Go"],
        2,
    ),
    (
        "Which data structure uses first-in, first-out ordering?",
        ["Stack", "Queue", "Tree", "Graph"],
        1,
    ),
    (
        "How many sides does a hexagon have?",
        ["Five", "Six", "Seven", "Eight"],
        1,
    ),
    (
        "Which organ is primarily responsible for filtering blood in humans?",
        ["Liver", "Heart", "Kidney", "Lung"],
        2,
    ),
]
