"""HTML fixtures copied verbatim from the reference's own test suite
(/root/reference/internal/scraper/scraper_test.go:17-137) — these are the
inputs for the byte-identical-extraction parity gate (BASELINE.json:15).
"""

HTML1 = """
                            <div class="teaser event-teaser teaser-border teaser-hover">
                                <div class="event-teaser-image event-teaser-image--full"><a
                                        href="/events/10-03-2023-krachstock-final-story" class=""><!--[--><img
                                            src="data:image/gif;base64,R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
                                            class="image image--event_teaser v-lazy-image"><!--]--><!----></a>
                                    <div class="event-tix"><a class="button"
                                            href="https://www.petzi.ch/events/51480/tickets" target="_blank"
                                            rel="nofollow">Tickets</a></div>
                                </div>
                                <div class="event-teaser-info">
                                    <div class="event-teaser-top"><a href="/events/10-03-2023-krachstock-final-story"
                                            class="event-date size-m bold">Fr, 10.03.2023 - 20:00</a></div><a
                                        href="/events/10-03-2023-krachstock-final-story" class="event-teaser-bottom">
                                        <div class="size-xl event-title">Krachstock</div>
                                        <div class="artist-list"><!--[-->
                                            <h3 class="size-xxl"><!--[-->
                                                <div class="artist-teaser">
                                                    <div class="artist-name">Final Story</div>
                                                    <div class="artist-info">Aargau</div>
                                                </div><!----><!--]-->
                                            </h3>
                                            <h3 class="size-xxl"><!--[-->
                                                <div class="artist-teaser">
                                                    <div class="artist-name">Moment Of Madness</div>
                                                    <div class="artist-info">Basel</div>
                                                </div><!----><!--]-->
                                            </h3>
                                            <h3 class="size-xxl"><!--[-->
                                                <div class="artist-teaser">
                                                    <div class="artist-name">Irony of Fate</div>
                                                    <div class="artist-info">Bern</div>
                                                </div><!----><!--]-->
                                            </h3><!--]--><!---->
                                        </div><!---->
                                        <div class="event-teaser-tags"><!--[-->
                                            <div class="tag">Konzert</div><!--]--><!--[-->
                                            <div class="tag">Metal</div>
                                            <div class="tag">Metalcore</div><!--]-->
                                        </div>
                                    </a>
                                </div>
                            </div>"""

HTML2 = """
	<h2>
		<a href="https://www.eventfabrik-muenchen.de/event/heinz-rudolf-kunze-verstaerkung-2/"
			title="Heinz Rudolf Kunze &amp; Verstärkung &#8211; ABGESAGT">
			<span>Di. | 03.05.2022</span><span>Heinz Rudolf Kunze &amp; Verstärkung
				&#8211; ABGESAGT</span> </a>
	</h2>"""

HTML3 = """
	<h2>
		<a href="?bli=bla"
			title="Heinz Rudolf Kunze &amp; Verstärkung &#8211; ABGESAGT">
			<span>Di. | 03.05.2022</span><span>Heinz Rudolf Kunze &amp; Verstärkung
				&#8211; ABGESAGT</span> </a>
	</h2>"""

HTML4 = """
	<div class="text">
		<a href="programm.php?m=4&j=2023&vid=4378">
			<div class="reihe">Treffpunkt</div>
			<div class="titel">Kreativ-Workshop: "My message to the world"
				<span class="supportband">— Творча майстерня: "Моє послання до світу"</span>
			</div>
			<div class="beschreibung"><em>Osterferienprogramm Ukrainehilfe / ПРОГРАМА ПАСХАЛЬНИХ КАНІКУЛ ПІДТРИМКА УКРАЇНЦІВ</em></div>
		</a>
	</div>"""

HTML5 = """
	<h2>
		<a href="?bli=bla"
			title="Heinz Rudolf Kunze &amp; Verstärkung &#8211; ABGESAGT">
			<span>29.02.</span><span>Heinz Rudolf Kunze &amp; Verstärkung
				&#8211; ABGESAGT</span> </a>
	</h2>"""

HTML6 = """
	<h2>
		<a href="../site/event/id/165"
			title="Heinz Rudolf Kunze &amp; Verstärkung &#8211; ABGESAGT">
			<span>29.02.</span><span>Heinz Rudolf Kunze &amp; Verstärkung
				&#8211; ABGESAGT</span> </a>
	</h2>"""

HTML7 = """
	<h2>
		<a href="../site/event/id/165"
			title="Heinz Rudolf Kunze &amp; Verstärkung &#8211; ABGESAGT">
			<span>20.02.</span><span>Heinz Rudolf Kunze &amp; Verstärkung
				&#8211; ABGESAGT</span> </a>
	</h2>"""

HTML8 = """
	<div class="header">
		<h3 class="artist">
			<span class="name">CJ Bolland</span><span class="artist-info"> (Bonzai, BE)
		</h3>
		<h3 class="artist">
			<span class="name">M.I.K.E. PUSH</span><span class="artist-info"> (Bonzai, BE)
		</h3>
		<h3 class="artist">
			<span class="name">Bonzai All Stars</span><span class="artist-info"> (Bonzai, BE)
		</h3>
		<h3 class="artist">
			<span class="name">Madwave</span><span class="artist-info">
		</h3>
	</div>"""

HTML9 = """
	<script id="structured-data" type="application/ld+json" data-nscript="afterInteractive">{
		"@context": "https://schema.org",
		"@type": "TheaterEvent",
		"name": "Rhys Darby: The Legend Returns",
		"startDate": "2025-06-03T19:00:00.000Z",
		"endDate": "2025-06-03T21:00:00.000Z",
		"eventAttendanceMode": "https://schema.org/OfflineEventAttendanceMode",
		"eventStatus": "https://schema.org/EventScheduled"
	}</script>"""

HTML10 = """
	<script id="structured-data" type="application/ld+json" data-nscript="afterInteractive">this is no json</script>"""

HTML11 = """
	<h3 class="date">
		<span>12.12.2024 14:30</span>
	</h3>"""

MOCK_PAGE = """<div class="artist-list"><!--[-->
    <h3 class="size-xxl"><!--[-->
        <div class="artist-teaser">
            <div class="artist-name">Final Story</div>
            <div class="artist-info">Aargau</div>
        </div><!----><!--]-->
        <div class="date">
            20.8.2025 20:00
        </div>
    </h3>
    <h3 class="size-xxl"><!--[-->
        <div class="artist-teaser">
            <div class="artist-name">Moment Of Madness</div>
            <div class="artist-info">Basel</div>
        </div><!----><!--]-->
        <div class="date">
            21.8.2025 21:00
        </div>
    </h3>
    <h3 class="size-xxl"><!--[-->
        <div class="artist-teaser">
            <div class="artist-name">Irony of Fate</div>
            <div class="artist-info">Bern</div>
        </div><!----><!--]-->
        <div class="date">
            22.8.2025 20:30
        </div>
    </h3><!--]--><!---->
</div><!---->
"""


# The reference's end-to-end mock scraper config
# (/root/reference/config-mock.yaml:1-79) — lives in the package so the
# crawl_mock_items query works when only the package zip ships.
MOCK_CONFIG = """
writer:
  type: file
  filedir: mock-items
  write_status: true
scrapers:
  - name: mock
    url: "https://mock.url"
    fetcher:
      type: mock
    item: div > h3.size-xxl
    fields:
      - name: sourceUrl
        value: "https://mock.url"
      - name: location
        value: MockVenue
      - name: city
        value: Zurich
      - name: country
        value: Switzerland
      - name: type
        value: concert
      - name: url
        value: "https://mock.url"
      - name: title
        location:
          selector: div.artist-name
      - name: date
        type: date
        components:
          - covers:
              day: true
              month: true
              year: true
              time: true
            location:
              selector: div.date
            layout: ["2.1.2006 15:04"]
"""
